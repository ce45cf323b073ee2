#!/usr/bin/env python3
"""GGUF model size report: per-module tensor sizes, dtypes, totals.

Text-mode analogue of the reference's layer_flamechart.py — groups tensors by
name prefix and prints a size breakdown so quantization coverage is auditable.

Usage:
    python scripts/model_report.py model.gguf [--depth 3]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nemotron_tpu.gguf.reader import read_gguf


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--tensors", action="store_true", help="per-tensor listing")
    args = ap.parse_args()

    g = read_gguf(args.model)
    print(f"{args.model}: {len(g.tensors)} tensors, "
          f"arch={g.kv.get('general.architecture')}")

    groups = defaultdict(lambda: [0, 0, defaultdict(int)])
    total = 0
    for name, info in g.tensors.items():
        # collapse layer indices so all layers group together
        key = re.sub(r"\.\d+\.", ".N.", name)
        key = ".".join(key.split(".")[: args.depth])
        nb = info.nbytes
        groups[key][0] += nb
        groups[key][1] += 1
        groups[key][2][info.type_name] += 1
        total += nb
        if args.tensors:
            print(f"  {name:70s} {str(info.shape):>20s} {info.type_name:>5s} "
                  f"{nb / 1e6:8.2f} MB")

    print(f"\n{'module':<44s} {'tensors':>7s} {'size':>10s} {'%':>6s}  dtypes")
    for key, (nb, cnt, dtypes) in sorted(groups.items(), key=lambda x: -x[1][0]):
        ds = ",".join(f"{k}x{v}" for k, v in sorted(dtypes.items()))
        bar = "#" * int(40 * nb / total)
        print(f"{key:<44s} {cnt:>7d} {nb / 1e6:>8.1f}MB {100 * nb / total:>5.1f}%  {ds}")
        print(f"  {bar}")
    print(f"\ntotal: {total / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
