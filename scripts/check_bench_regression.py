"""Round-over-round bench regression gate (VERDICT r3 next-round #1c).

Compares two bench JSON files (default: the two highest-numbered
BENCH_r*.json in the repo root) and flags:
  * any metric that is null/missing in the newer file but present before;
  * any throughput metric that dropped by more than THRESHOLD;
  * any seconds-metric that grew by more than THRESHOLD.

Exit code 1 if anything is flagged, so it can gate CI or a round commit.

Usage: python scripts/check_bench_regression.py [old.json new.json]
"""
import glob
import json
import os
import re
import sys

THRESHOLD = 0.20

# Explicit metric-direction classification (ADVICE r4: substring sniffing
# would misread a future timing metric named e.g. *_ms as throughput and
# pass a slowdown).  Every metric must match exactly one suffix rule;
# unclassifiable names are a hard error.
LOWER_IS_BETTER_SUFFIXES = ("_seconds", "_ms", "_s")
HIGHER_IS_BETTER_SUBSTRINGS = ("_per_s", "_per_sec", "_ops", "_throughput")


def direction(metric: str) -> bool:
    """True if lower is better.  Raises on unclassifiable names."""
    if any(s in metric for s in HIGHER_IS_BETTER_SUBSTRINGS):
        return False
    if any(metric.endswith(s) or f"{s}_log" in metric
           for s in LOWER_IS_BETTER_SUFFIXES):
        return True
    raise SystemExit(
        f"cannot classify metric direction for {metric!r}: add it to "
        "LOWER_IS_BETTER_SUFFIXES or HIGHER_IS_BETTER_SUBSTRINGS")


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    with open(path) as f:
        data = json.load(f)
    if "metric" not in data and "tail" in data:
        # driver wrapper format: the bench's one-line JSON is embedded in
        # the captured stdout tail
        for line in data["tail"].splitlines():
            line = line.strip()
            if line.startswith('{"metric"'):
                data = json.loads(line)
                break
        else:
            raise ValueError(f"no bench JSON line in {path}")
    flat = {data["metric"]: data["value"]}
    for k, v in data.get("aux", {}).items():
        if k in ("bench_wall_seconds", "spans", "span_walls"):
            continue
        flat[k] = v
    return flat


def main():
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        files = sorted(
            glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
        if len(files) < 2:
            print("need at least two BENCH_r*.json files")
            return 0
        old_path, new_path = files[-2], files[-1]
    old, new = load(old_path), load(new_path)
    print(f"comparing {os.path.basename(old_path)} -> "
          f"{os.path.basename(new_path)}")
    flags = []
    for k, ov in old.items():
        nv = new.get(k)
        if ov is None:
            continue
        if nv is None:
            flags.append(f"NULL: {k} was {ov:.4g}, now missing/null")
            continue
        lower_is_better = direction(k)
        ratio = nv / ov if ov else float("inf")
        if lower_is_better:
            if ratio > 1 + THRESHOLD:
                flags.append(f"REGRESSION: {k} {ov:.4g}s -> {nv:.4g}s "
                             f"({ratio:.2f}x slower)")
            else:
                print(f"  ok {k}: {ov:.4g}s -> {nv:.4g}s ({ratio:.2f}x)")
        else:
            if ratio < 1 - THRESHOLD:
                flags.append(f"REGRESSION: {k} {ov:.4g} -> {nv:.4g} "
                             f"({ratio:.2f}x)")
            else:
                print(f"  ok {k}: {ov:.4g} -> {nv:.4g} ({ratio:.2f}x)")
    for f in flags:
        print(f)
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
