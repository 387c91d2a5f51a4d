"""Minimal DICOM reader + dcm2nii driver (gfe_mamba_tpu/data/dicom.py,
tools/dcm2nii.py) -- the in-repo replacement for the reference's
dcm2niix.exe workflow (GEF-Mamba_ADNI_Dataset/dcm2nii)."""

import os
import struct

import numpy as np
import pytest

from gfe_mamba_tpu.data.dicom import (
    EXPLICIT_LE, IMPLICIT_LE, read_dicom, stack_series)
from gfe_mamba_tpu.data.nifti import load_nifti


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"UT", b"UN", b"SQ"):
        return (struct.pack("<HH2sHI", group, elem, vr, 0, len(value))
                + value)
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HHI", group, elem, len(value)) + value


def _txt(s):
    b = s.encode()
    return b + b" " if len(b) % 2 else b


def write_dicom(path, pixels: np.ndarray, *, ptid="123_S_4567",
                date="20240131", series="1.2.3.4", instance=1,
                position=(0.0, 0.0, 0.0), explicit=True,
                slope=2.0, intercept=-10.0):
    rows, cols = pixels.shape
    tags = [
        ((0x0008, 0x0020), b"DA", _txt(date)),
        ((0x0010, 0x0020), b"LO", _txt(ptid)),
        ((0x0020, 0x000E), b"UI", _txt(series)),
        ((0x0020, 0x0013), b"IS", _txt(str(instance))),
        ((0x0020, 0x0032), b"DS",
         _txt("\\".join(f"{p:.1f}" for p in position))),
        ((0x0020, 0x0037), b"DS", _txt("1\\0\\0\\0\\1\\0")),
        ((0x0028, 0x0010), b"US", struct.pack("<H", rows)),
        ((0x0028, 0x0011), b"US", struct.pack("<H", cols)),
        ((0x0028, 0x0030), b"DS", _txt("0.5\\0.5")),
        ((0x0018, 0x0050), b"DS", _txt("1.2")),
        ((0x0028, 0x0100), b"US", struct.pack("<H", 16)),
        ((0x0028, 0x0103), b"US", struct.pack("<H", 1)),
        ((0x0028, 0x1052), b"DS", _txt(str(intercept))),
        ((0x0028, 0x1053), b"DS", _txt(str(slope))),
        ((0x7FE0, 0x0010), b"OW", pixels.astype("<i2").tobytes()),
    ]
    ts = (EXPLICIT_LE if explicit else IMPLICIT_LE).encode()
    if len(ts) % 2:
        ts += b"\x00"
    meta = (_el_explicit(0x0002, 0x0002, b"UI", _txt("1.2.840.10008.5.1.4"))
            + _el_explicit(0x0002, 0x0010, b"UI", ts))
    body = b""
    for (g, e), vr, v in tags:
        body += _el_explicit(g, e, vr, v) if explicit \
            else _el_implicit(g, e, v)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


@pytest.mark.parametrize("explicit", [True, False])
def test_read_dicom_roundtrip(tmp_path, explicit):
    rng = np.random.default_rng(0)
    px = rng.integers(-500, 2000, (16, 12)).astype(np.int16)
    p = tmp_path / "a.dcm"
    write_dicom(str(p), px, explicit=explicit)
    s = read_dicom(str(p))
    assert (s.rows, s.cols) == (16, 12)
    assert s.patient_id == "123_S_4567"
    assert s.study_date == "20240131"
    assert s.pixel_spacing == (0.5, 0.5)
    np.testing.assert_array_equal(s.pixels, px)
    assert (s.rescale_slope, s.rescale_intercept) == (2.0, -10.0)


def test_stack_series_sorts_by_position(tmp_path):
    rng = np.random.default_rng(1)
    vols = rng.integers(0, 100, (3, 8, 8)).astype(np.int16)
    # write out of order; spatial position encodes the true order
    for i, z in [(0, 2.5), (1, 0.0), (2, 5.0)]:
        write_dicom(str(tmp_path / f"s{i}.dcm"), vols[i],
                    position=(0, 0, z), instance=99 - i)
    paths = [str(tmp_path / f"s{i}.dcm") for i in range(3)]
    vol, meta = stack_series(paths)
    assert vol.shape == (8, 8, 3)
    # order by z: s1 (0.0), s0 (2.5), s2 (5.0); rescale 2x-10
    np.testing.assert_allclose(vol[..., 0], vols[1] * 2.0 - 10.0)
    np.testing.assert_allclose(vol[..., 1], vols[0] * 2.0 - 10.0)
    np.testing.assert_allclose(vol[..., 2], vols[2] * 2.0 - 10.0)
    assert meta["spacing"] == (0.5, 0.5, 2.5)
    assert meta["patient_id"] == "123_S_4567"


def test_dcm2nii_adni_tree(tmp_path, monkeypatch):
    """Full driver: ADNI layout -> PTID-date-label .nii.gz consumable
    by the classify dataset's filename parser."""
    import tools.dcm2nii as d2n
    from gfe_mamba_tpu.data.datasets import parse_classify_filename

    monkeypatch.setattr(d2n, "_dcm2niix", lambda: None)  # force python path
    rng = np.random.default_rng(2)
    series = (tmp_path / "adni" / "123_S_4567" / "MPRAGE"
              / "2024-01-31_09_10_11.0" / "I123456")
    series.mkdir(parents=True)
    for i in range(4):
        write_dicom(str(series / f"{i}.dcm"),
                    rng.integers(0, 500, (10, 10)).astype(np.int16),
                    position=(0, 0, float(i)), instance=i + 1)
    out = tmp_path / "out"
    import sys
    monkeypatch.setattr(sys, "argv",
                        ["dcm2nii.py", str(tmp_path / "adni"), str(out),
                         "--label", "1"])
    d2n.main()
    files = sorted(os.listdir(out))
    assert files == ["123_S_4567-2024_01_31_09_10_11.0-1.nii.gz"]
    ptid, date, label = parse_classify_filename(files[0])
    assert (ptid, date, label) == ("123_S_4567", "2024-01-31", 1)
    vol, _ = load_nifti(str(out / files[0]))
    assert vol.shape == (10, 10, 4)
