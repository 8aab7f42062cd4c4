"""Extract the frozen parity dataset from the reference sources into .npz.

The reference ships the same captured 802.11 frame twice: frequency-domain
tables in ``inputs.h`` (tx/rx_preamble_fft[53], tx/rx_symb[795], OW2 —
inputs.h:18,20,75,130,928) used by the C drivers, and time-domain tables in
``WiFi_inputs.m`` (tx/rx_packet[1200], tx/rx_lptot[160] — WiFi_inputs.m:4,
1208,2412,2575) used by the MATLAB chain.  This module parses both numeric
tables (data, not code) into a single ``.npz`` so the framework is
standalone; the result is committed at ``tpu80211/datasets/data/wifi_capture.npz``
and re-generated with ``python -m tpu80211.datasets.extract <reference_dir>``.
"""

from __future__ import annotations

import pathlib
import re
import sys

import numpy as np

_C_COMPLEX = re.compile(
    r"([+-]?\d+\.?\d*(?:[eE][+-]?\d+)?)\s*([+-])\s*(\d+\.?\d*(?:[eE][+-]?\d+)?)\s*\*\s*I"
)
_M_COMPLEX = re.compile(
    r"([+-]?\d+\.?\d*(?:[eE][+-]?\d+)?)\s*([+-])\s*(\d+\.?\d*(?:[eE][+-]?\d+)?)i"
)


def _parse_complex_table(text: str, pattern: re.Pattern) -> np.ndarray:
    vals = [
        complex(float(re_), float(sign + im))
        for re_, sign, im in pattern.findall(text)
    ]
    return np.asarray(vals, dtype=np.complex128)


def _slice_between(text: str, start: str, end: str) -> str:
    i = text.index(start)
    j = text.index(end, i + len(start))
    return text[i:j]


def extract_inputs_h(path: pathlib.Path) -> dict:
    text = path.read_text()
    ow2 = float(re.search(r"OW2\s*=\s*([\d.eE+-]+)\s*;", text).group(1))
    sections = {}
    names = ["tx_preamble_fft", "rx_preamble_fft", "tx_symb", "rx_symb"]
    markers = [f"{n}[" for n in names] + ["\0"]
    for k, name in enumerate(names):
        seg = (
            _slice_between(text, markers[k], markers[k + 1])
            if k + 1 < len(names)
            else text[text.index(markers[k]):]
        )
        sections[name] = _parse_complex_table(seg, _C_COMPLEX)
    assert sections["tx_preamble_fft"].shape == (53,)
    assert sections["rx_preamble_fft"].shape == (53,)
    assert sections["tx_symb"].shape == (795,)
    assert sections["rx_symb"].shape == (795,)
    sections["ow2"] = np.float64(ow2)
    return sections


def extract_wifi_inputs_m(path: pathlib.Path) -> dict:
    text = path.read_text()
    names = ["rx_packet", "tx_packet", "tx_lptot", "rx_lptot"]
    shapes = {"rx_packet": 1200, "tx_packet": 1200, "tx_lptot": 160, "rx_lptot": 160}
    out = {}
    # anchor on the assignments, not the function-signature mentions
    starts = {n: re.search(rf"{n}\s*=\s*\[", text).start() for n in names}
    order = sorted(names, key=starts.get)
    bounds = {n: starts[order[i + 1]] if i + 1 < len(order) else len(text)
              for i, n in enumerate(order)}
    for name in names:
        seg = text[starts[name] : bounds[name]]
        arr = _parse_complex_table(seg, _M_COMPLEX)
        assert arr.shape == (shapes[name],), (name, arr.shape)
        out[name] = arr
    return out


def extract(reference_dir: str | pathlib.Path, out_path: str | pathlib.Path) -> dict:
    ref = pathlib.Path(reference_dir)
    data = extract_inputs_h(ref / "inputs.h")
    data.update(extract_wifi_inputs_m(ref / "WiFi_inputs.m"))
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **data)
    return data


def main(argv=None):
    argv = argv or sys.argv[1:]
    ref = argv[0] if argv else "/root/reference"
    out = (
        argv[1]
        if len(argv) > 1
        else pathlib.Path(__file__).parent / "data" / "wifi_capture.npz"
    )
    data = extract(ref, out)
    print(f"wrote {out}: " + ", ".join(f"{k}{getattr(v, 'shape', '')}" for k, v in data.items()))


if __name__ == "__main__":
    main()
