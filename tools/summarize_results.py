"""Summarize a full experiment-grid run (results/*/*.jsonl) into RESULTS.md.

Per output file and method family: best final norm_res / objective gap and
the oracle-call cost at the criterion, mirroring the reference's
find_best-based plotting selection. Usage:

    python tools/summarize_results.py [--results results] [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaprox_tpu.utils.logging import read_jsonl  # noqa: E402


def family(method: str) -> str:
    return method.split(" (")[0] if " (" in method else method


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="results")
    p.add_argument("--out", default="RESULTS.md")
    args = p.parse_args()

    lines = [
        "# RESULTS — full experiment grid run\n",
        f"\nGenerated {datetime.datetime.now():%Y-%m-%d %H:%M} from "
        f"`{args.results}/` by tools/summarize_results.py. Datasets fall back "
        "to shape-matched synthetics when offline; criteria are the "
        "reference's (BASELINE.md).\n",
    ]
    for path in sorted(glob.glob(os.path.join(args.results, "*", "*.jsonl"))):
        rows = read_jsonl(path)
        rel = os.path.relpath(path, args.results)
        by_method: dict[str, list] = {}
        optimum = None
        data_source = None
        for r in rows:
            if r.get("data_source") is not None:
                data_source = r["data_source"]
                continue
            if r.get("method") is None:
                cand = [v for v in (optimum, r.get("objective")) if v is not None]
                if cand:
                    optimum = min(cand)
                continue
            by_method.setdefault(r["method"], []).append(r)
        if optimum is None:
            objs = [r.get("objective") for rs in by_method.values() for r in rs
                    if r.get("objective") is not None]
            finite = [o for o in objs if o not in (None,) and o == o and o != float("inf")]
            optimum = min(finite) if finite else None

        label = {"synthetic": " — SYNTHETIC fallback data",
                 "libsvm": " — real LIBSVM data"}.get(data_source, "")
        lines.append(f"\n## {rel}{label}\n\n")
        lines.append("| family | best variant | numit | final norm_res | final gap |\n")
        lines.append("|---|---|---|---|---|\n")
        fams: dict[str, list] = {}
        for m, rs in by_method.items():
            fams.setdefault(family(m), []).append((m, rs))
        for fam in sorted(fams):
            # best variant: smallest final residual
            best = min(fams[fam], key=lambda t: t[1][-1].get("norm_res", float("inf")))
            m, rs = best
            last = rs[-1]
            res = last.get("norm_res")
            obj = last.get("objective")
            gap = (obj - optimum) if (obj is not None and optimum is not None
                                      and obj == obj and obj != float("inf")) else None
            lines.append(
                f"| {fam} | {m} | {last.get('it', len(rs))} | "
                f"{res:.2e} | " + (f"{gap:.2e}" if gap is not None else "—") + " |\n"
            )

    with open(args.out, "w") as fh:
        fh.writelines(lines)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
