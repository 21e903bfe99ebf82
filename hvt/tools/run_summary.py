"""Summarize a run's jsonl metric logs (hvt.utils.logging.RunLogger output).

The reference's observability is a live wandb dashboard; hvt's offline
equivalent is the per-rank ``logs/log{rank}.txt`` jsonl stream. This tool
turns one run's stream into a terminal summary: step range, wall time,
throughput, and first/best/last values for every logged metric.

Usage:
    python -m hvt.tools.run_summary <run-dir-or-log-file> [--rank 0] [--json]
"""

from __future__ import annotations

import argparse
import json
import pathlib


def parse_records(path: pathlib.Path) -> list[dict]:
    """jsonl records from a log file; non-JSON lines (the config dump) are
    skipped."""
    records = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "step" in rec:
            records.append(rec)
    return records


# Metrics where a bigger value is better (everything else: smaller-is-better
# for the "best" column, e.g. losses and tree-dist).
_HIGHER_BETTER = ("acc@", "samples_per_sec")


def summarize(records: list[dict]) -> dict:
    if not records:
        return {"steps": 0, "metrics": {}}
    steps = [r["step"] for r in records]
    times = [r["time"] for r in records if "time" in r]
    metrics: dict[str, dict] = {}
    for rec in records:
        for key, value in rec.items():
            if key in ("step", "time") or not isinstance(value, (int, float)):
                continue
            m = metrics.setdefault(
                key, {"first": value, "last": value, "best": value, "n": 0}
            )
            m["last"] = value
            m["n"] += 1
            better = (
                value > m["best"]
                if any(s in key for s in _HIGHER_BETTER)
                else value < m["best"]
            )
            if better:
                m["best"] = value
    out = {
        "steps": max(steps),
        "records": len(records),
        "metrics": metrics,
    }
    if len(times) >= 2:
        out["wall_seconds"] = round(max(times) - min(times), 1)
    return out


def format_summary(summary: dict, name: str = "") -> str:
    lines = [f"# run summary{': ' + name if name else ''}"]
    lines.append(
        f"steps: {summary.get('steps', 0)}   records: {summary.get('records', 0)}"
        + (f"   wall: {summary['wall_seconds']}s" if "wall_seconds" in summary else "")
    )
    if summary["metrics"]:
        w = max(len(k) for k in summary["metrics"])
        lines.append(f"{'metric'.ljust(w)}  {'first':>12} {'best':>12} {'last':>12}")
        for key in sorted(summary["metrics"]):
            m = summary["metrics"][key]
            lines.append(
                f"{key.ljust(w)}  {m['first']:>12.5g} {m['best']:>12.5g} "
                f"{m['last']:>12.5g}"
            )
    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("path", help="run dir (containing logs/) or a log file")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args()

    path = pathlib.Path(args.path)
    if path.is_dir():
        path = path / "logs" / f"log{args.rank}.txt"
    if not path.is_file():
        raise SystemExit(f"no log file at {path}")
    summary = summarize(parse_records(path))
    if args.as_json:
        print(json.dumps(summary))
    else:
        print(format_summary(summary, name=str(path)))


if __name__ == "__main__":
    main()
