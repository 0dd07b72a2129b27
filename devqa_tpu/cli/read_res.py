"""Results aggregation CLI — the reference's ``read_res.py``: walk
``eval_results/**/mean_results.json`` and print the t×i TSV grid.

Matches read_res.py:12-31: cross probes (t1i2, t2i1, t2i2, t1i4, t2i4,
t1i3) report 1−acc (drift = editing leakage), t3* and text_loc report acc.
"""
from __future__ import annotations

import argparse
import json
import os

KY = ["model", "data", "method", "t1i2", "t2i1", "t2i2", "t1i4", "t2i4",
      "t1i3", "t3i1", "t3i3", "text_loc"]


def collect(results_root: str):
    rows = [KY]
    files = []
    for i, _, k in os.walk(results_root):
        for kk in k:
            if kk.endswith("mean_results.json"):
                files.append(os.path.join(i, kk))
    for f in sorted(files):
        data = json.load(open(f))
        total = data.get("total_mean", data)
        loc = total.get("locality", {})
        if len(loc) != 9:
            continue
        parts = f.split(os.sep)
        # .../<editor>/<model>/<eval>/<protocol>/mean_results.json
        row = [parts[-4], parts[-3], parts[-5]]
        for key in KY[3:]:
            acc = loc[key]["acc"]
            if "t3" not in key and key != "text_loc":
                row.append(str(1 - acc))
            else:
                row.append(str(acc))
        rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_root", nargs="?", default="eval_results")
    args = p.parse_args()
    for r in collect(args.results_root):
        print("\t".join(r))


if __name__ == "__main__":
    main()
