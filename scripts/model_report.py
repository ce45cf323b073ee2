#!/usr/bin/env python3
"""GGUF model size report: per-module tensor sizes, dtypes, totals.

Analogue of the reference's layer_flamechart.py: a grouped text breakdown so
quantization coverage is auditable, plus --html for an interactive flamechart
(nested name-hierarchy bars, hover details, click-to-zoom).

Usage:
    python scripts/model_report.py model.gguf [--depth 3] [--html out.html]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nemotron_tpu.gguf.reader import read_gguf

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>GGUF flamechart — @@TITLE@@</title>
<style>
 body { font: 13px/1.4 system-ui, sans-serif; margin: 16px; }
 #chart { position: relative; width: 100%; }
 .cell { position: absolute; height: 26px; box-sizing: border-box;
         border: 1px solid #fff; border-radius: 3px; overflow: hidden;
         white-space: nowrap; font-size: 11px; padding: 4px 4px 0;
         cursor: pointer; color: #222; }
 .cell:hover { filter: brightness(1.12); }
 #info { margin: 10px 0; padding: 8px; background: #f4f4f4;
         border-radius: 4px; min-height: 2.5em; }
</style></head><body>
<h2>@@TITLE@@ — @@TOTALMB@@ MB, @@NTENSORS@@ tensors</h2>
<div id="info">hover a cell; click to zoom, click the root row to reset</div>
<div id="chart"></div>
<script>
const root = @@TREE@@;
const chart = document.getElementById("chart");
const info = document.getElementById("info");
const palette = ["#7aa2d4","#8fbf8f","#d4a97a","#c98fbf","#9fd4cf",
                 "#d4c97a","#b3a2e3","#e3a2a2"];
function render(node) {
  chart.innerHTML = "";
  const W = chart.clientWidth || 1200;
  let maxDepth = 0;
  function walk(n, x0, x1, depth, hue) {
    maxDepth = Math.max(maxDepth, depth);
    const div = document.createElement("div");
    div.className = "cell";
    div.style.left = (100 * x0 / W) + "%";
    div.style.width = Math.max(0.08, 100 * (x1 - x0) / W) + "%";
    div.style.top = (depth * 28) + "px";
    div.style.background = palette[hue % palette.length];
    div.textContent = n.name + " " + (n.size / 1e6).toFixed(1) + "MB";
    div.onmouseenter = () => {
      info.textContent = n.path + " — " + (n.size / 1e6).toFixed(2)
        + " MB, " + n.count + " tensors (" + (100 * n.size / root.size)
        .toFixed(1) + "% of model)" + (n.dtypes ? " — " + n.dtypes : "");
    };
    div.onclick = (e) => { e.stopPropagation(); render(depth ? n : root); };
    chart.appendChild(div);
    let x = x0;
    (n.children || []).forEach((c, i) => {
      const w = (x1 - x0) * c.size / n.size;
      walk(c, x, x + w, depth + 1, depth ? hue : i);
      x += w;
    });
  }
  walk(node, 0, W, 0, 0);
  chart.style.height = ((maxDepth + 1) * 28 + 8) + "px";
}
render(root);
window.addEventListener("resize", () => render(root));
</script></body></html>
"""


def build_tree(tensors) -> dict:
    """Fold tensor names into a size-weighted hierarchy (layer indices
    collapsed into one 'N' level so 24 layers render as one branch)."""
    root = {"name": "model", "path": "", "size": 0, "count": 0,
            "children": {}, "dtypes": defaultdict(int)}
    for name, ti in tensors.items():
        parts = re.sub(r"\.(\d+)\.", ".N.", name).split(".")
        node = root
        node["size"] += ti.nbytes
        node["count"] += 1
        node["dtypes"][ti.type_name] += 1
        for p in parts:
            node = node["children"].setdefault(
                p, {"name": p, "path": (node["path"] + "." + p).lstrip("."),
                    "size": 0, "count": 0, "children": {},
                    "dtypes": defaultdict(int)})
            node["size"] += ti.nbytes
            node["count"] += 1
            node["dtypes"][ti.type_name] += 1

    def finish(n):
        kids = sorted(n["children"].values(), key=lambda c: -c["size"])
        n["children"] = [finish(c) for c in kids]
        n["dtypes"] = ",".join(f"{k}x{v}" for k, v in sorted(n["dtypes"].items()))
        return n

    return finish(root)


def write_flamechart(tensors, out_path: str, title: str) -> None:
    tree = build_tree(tensors)
    html = (_HTML
            .replace("@@TITLE@@", title)
            .replace("@@TOTALMB@@", f"{tree['size'] / 1e6:.1f}")
            .replace("@@NTENSORS@@", str(tree["count"]))
            .replace("@@TREE@@", json.dumps(tree)))
    Path(out_path).write_text(html)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--tensors", action="store_true", help="per-tensor listing")
    ap.add_argument("--html", default=None,
                    help="write an interactive flamechart to this path")
    args = ap.parse_args()

    g = read_gguf(args.model)
    print(f"{args.model}: {len(g.tensors)} tensors, "
          f"arch={g.kv.get('general.architecture')}")

    if args.html:
        write_flamechart(g.tensors, args.html, Path(args.model).name)
        print(f"flamechart -> {args.html}")

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
