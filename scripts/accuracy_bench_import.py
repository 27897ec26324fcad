"""Import shim: expose accuracy_bench.run_one as a module import
(accuracy_bench.py is primarily a CLI script)."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "accuracy_bench",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "accuracy_bench.py"))
_m = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_m)
run_one = _m.run_one
