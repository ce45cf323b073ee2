#!/usr/bin/env python3
"""Diff two tensor dumps: max/mean/rms error + log-magnitude histogram.

Accepts .npy files or the shape-headed raw-f32 dump format written by
nemotron_tpu.utils.dump (and the reference's append_dump_array:
32-byte header of four i64 dims, then f32 payloads appended per step).

Usage:
    python scripts/compare_tensors.py a.npy b.npy
    python scripts/compare_tensors.py dump_a.bin dump_b.bin [--step N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    raw = Path(path).read_bytes()
    dims = np.frombuffer(raw[:32], dtype="<i8")
    shape = [int(d) for d in dims if d > 1] or [1]
    data = np.frombuffer(raw[32:], dtype="<f4")
    n = int(np.prod([int(d) for d in dims if d >= 1]))
    n = max(n, 1)
    steps = len(data) // n
    return data[: steps * n].reshape((steps,) + tuple(int(d) for d in dims if d >= 1))


def report(a: np.ndarray, b: np.ndarray) -> None:
    if a.shape != b.shape:
        print(f"SHAPE MISMATCH: {a.shape} vs {b.shape}")
        n = min(a.size, b.size)
        a, b = a.reshape(-1)[:n], b.reshape(-1)[:n]
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    denom = np.maximum(np.abs(a), np.abs(b)).astype(np.float64) + 1e-12
    print(f"shape       : {a.shape}")
    print(f"max abs diff: {d.max():.6e}")
    print(f"mean abs    : {d.mean():.6e}")
    print(f"rms         : {np.sqrt((d ** 2).mean()):.6e}")
    print(f"max rel     : {(d / denom).max():.6e}")
    nz = d[d > 0]
    if nz.size:
        logs = np.floor(np.log10(nz)).astype(int)
        print("log10(|diff|) histogram:")
        for mag in range(logs.min(), logs.max() + 1):
            cnt = int((logs == mag).sum())
            if cnt:
                print(f"  1e{mag:+03d}: {'#' * min(60, max(1, cnt * 60 // len(nz)))} {cnt}")
    else:
        print("arrays identical")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--step", type=int, default=None,
                    help="compare only this appended step of a dump file")
    args = ap.parse_args()
    a, b = load(args.a), load(args.b)
    if args.step is not None:
        a, b = a[args.step], b[args.step]
    report(np.asarray(a), np.asarray(b))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
