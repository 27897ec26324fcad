"""Golden byte-level vectors for the MRPT rawlog parser.

Round-2 VERDICT flagged that `io/rawlog.py`'s payload layout was validated
only against its own `write_rawlog` fixture — a wrong assumption shared by
writer and parser would pass every test.  These vectors are hand-assembled
with raw `struct.pack` calls (no rawlog.py writer machinery), with every
field's byte offset documented inline against the MRPT serialization spec
the parser implements (rawlog.py module docstring; reference consumption:
/root/reference/Utils/Datasets.cpp:111-228).

No MRPT installation or real rawlog exists in this image (zero egress), so
these vectors encode the spec as independently as this environment allows:
if the parser's framing assumptions drift from the documented layout, these
fail even when writer+parser drift together.
"""

import gzip
import struct

import numpy as np
import pytest

from staticfusion_tpu.io import rawlog

FILETIME_EPOCH = 11644473600  # seconds 1601-01-01 -> 1970-01-01


def header(name: str, version: int) -> bytes:
    """MRPT object header: [u8 len|0x80][ascii name][i8 version]."""
    return bytes([len(name) | 0x80]) + name.encode() + struct.pack(
        "<b", version)


END = b"\x88"  # end-of-object flag (MRPT >= 0.5.5 framing)


def pose3d_zero() -> bytes:
    """CPose3D v2: 7 x f64 — x y z qr qx qy qz (identity)."""
    return (header("CPose3D", 2)
            + struct.pack("<7d", 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
            + END)


def golden_observation(depths, fname=b"img_0.png", label=b"KINECT",
                       trailing=b"") -> bytes:
    """One CObservation3DRangeScan v8, field by field.

    Layout (offsets relative to the start of this object):
      +0   header: 0x97 ('CObservation3DRangeScan' is 23 chars | 0x80),
           23 name bytes, i8 version=8                        (25 B)
      +25  f32 maxRange                                       (4 B)
      +29  CPose3D sensorPose (header 9 B + 56 B payload + end) (66 B)
      +95  u8 hasRangeImage = 1                               (1 B)
      +96  u8 rangeImage external = 0                         (1 B)
      +97  CMatrix: header 9 B ('CMatrix' 7 chars, v0), u32 rows,
           u32 cols, rows*cols f32 row-major, end flag
      ...  u8 hasIntensityImage = 1
      ...  CImage: header 8 B ('CImage', v9), u8 isColor, u8 external=1,
           u32 strlen, bytes filename, end flag
      ...  u8 hasConfidenceImage = 0
      ...  u8 hasPoints3D = 0
      ...  f32 stdError
      ...  u64 timestamp (FILETIME: 100 ns ticks since 1601-01-01)
      ...  u32 labelLen + label bytes
      ...  [optional trailing minor-version fields]
      ...  u8 0x88 end flag
    """
    d = np.asarray(depths, "<f4")
    rows, cols = d.shape
    body = b""
    body += header("CObservation3DRangeScan", 8)
    body += struct.pack("<f", 5.0)                       # maxRange
    body += pose3d_zero()                                # sensorPose
    body += b"\x01"                                      # hasRangeImage
    body += b"\x00"                                      # not external
    body += (header("CMatrix", 0)
             + struct.pack("<II", rows, cols) + d.tobytes() + END)
    body += b"\x01"                                      # hasIntensityImage
    body += (header("CImage", 9) + b"\x01" + b"\x01"     # color, external
             + struct.pack("<I", len(fname)) + fname + END)
    body += b"\x00"                                      # hasConfidenceImage
    body += b"\x00"                                      # hasPoints3D
    body += struct.pack("<f", 0.01)                      # stdError
    # 2026-08-21 00:00:00 UTC in FILETIME ticks.
    unix = 1755734400
    body += struct.pack("<Q", (unix + FILETIME_EPOCH) * 10_000_000)
    body += struct.pack("<I", len(label)) + label
    body += trailing
    body += END
    return body


DEPTHS = [[1.25, 2.5, 0.0], [4.0, 0.5, 3.125]]


def _parse(blob: bytes):
    import io
    r = rawlog._Reader(io.BytesIO(blob))
    scans = []
    while True:
        s = rawlog.read_scan(r)
        if s is None:
            return scans
        scans.append(s)


def test_golden_single_observation():
    scans = _parse(golden_observation(DEPTHS))
    assert len(scans) == 1
    s = scans[0]
    assert s.max_range == 5.0
    assert s.sensor_label == "KINECT"
    assert s.intensity_file == "img_0.png"
    assert s.timestamp == pytest.approx(1755734400.0, abs=1e-6)
    np.testing.assert_array_equal(s.range_image,
                                  np.asarray(DEPTHS, np.float32))


def test_golden_header_byte_values():
    """Pin the exact framing bytes the parser expects (first-byte length
    with the 0x80 continuation bit, i8 version, 0x88 terminator)."""
    blob = golden_observation(DEPTHS)
    assert blob[0] == 0x97                 # 23-char classname | 0x80
    assert blob[1:24] == b"CObservation3DRangeScan"
    assert blob[24] == 8                   # version
    assert struct.unpack("<f", blob[25:29])[0] == 5.0
    assert blob[29] == 0x87                # 'CPose3D' = 7 chars | 0x80
    assert blob[-1] == 0x88
    # CMatrix dims at the documented offset: header(25) + f32(4) +
    # pose(66) + 2 flag bytes + CMatrix header(9).
    off = 25 + 4 + 66 + 2 + 9
    assert struct.unpack("<II", blob[off:off + 8]) == (2, 3)


def test_golden_trailing_minor_version_fields():
    """Newer minor versions append fields before the end flag; the parser
    must resynchronize over them (rawlog.py read_scan tail)."""
    trailing = struct.pack("<f", 1.5) + struct.pack("<I", 7)
    two = (golden_observation(DEPTHS, trailing=trailing)
           + golden_observation([[9.0]], fname=b"img_1.png"))
    scans = _parse(two)
    assert len(scans) == 2
    np.testing.assert_array_equal(scans[0].range_image,
                                  np.asarray(DEPTHS, np.float32))
    assert scans[1].intensity_file == "img_1.png"
    assert scans[1].range_image[0, 0] == 9.0


def test_golden_skips_foreign_objects():
    """Rawlogs interleave other observation classes (odometry, IMU);
    read_scan must skip them by resync."""
    foreign = (header("CObservationOdometry", 1)
               + struct.pack("<3d", 0.5, -1.0, 0.25)    # opaque payload
               + END)
    blob = foreign + golden_observation(DEPTHS) + foreign
    scans = _parse(blob)
    assert len(scans) == 1
    assert scans[0].sensor_label == "KINECT"


def test_golden_gzip_stream(tmp_path):
    """Rawlogs on disk are gzip-wrapped; the loader must transparently
    decompress (Datasets.cpp uses CFileGZInputStream)."""
    p = tmp_path / "golden.rawlog"
    p.write_bytes(gzip.compress(golden_observation(DEPTHS)
                                + golden_observation([[2.0]],
                                                     fname=b"img_1.png")))
    r = rawlog._Reader(rawlog._open_stream(str(p)))
    s0 = rawlog.read_scan(r)
    s1 = rawlog.read_scan(r)
    assert rawlog.read_scan(r) is None
    assert s0.intensity_file == "img_0.png"
    assert s1.intensity_file == "img_1.png"


def test_golden_rejects_pre_055_framing():
    """Headers without the 0x80 continuation bit are the pre-0.5.5 format
    the parser documents as unsupported."""
    bad = bytes([23]) + b"CObservation3DRangeScan" + b"\x08"
    import io
    r = rawlog._Reader(io.BytesIO(bad))
    with pytest.raises(ValueError):
        r.header()
