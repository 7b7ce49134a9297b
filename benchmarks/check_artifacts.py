"""Artifact-integrity checker (VERDICT r4 #1).

Compares every working-tree ``BENCH_*.json`` against the version at git
HEAD and enforces the refresh discipline:

  * any metric that moved by more than 10% must carry a ``note`` field
    explaining the move (or the entry must carry ``spread_pct`` large
    enough to cover it — a wide measured spread IS the explanation);
  * no entry may ship with ``needs_note: true`` (set by
    ``_timing.write_bench_json`` when a >10% move lacked a note);
  * internal coherence: a loop-level ms/step can never be smaller than
    the raw step it wraps (the exact contradiction round 4 committed —
    samplernn raw 2.24 ms > loop 2.01 ms in one file).

Exit code 0 = clean, 1 = violations (listed on stdout).  Run before
committing any refreshed artifact::

    python benchmarks/check_artifacts.py
"""
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entries(doc):
    return {e.get("metric"): e for e in doc.get("results", [])}


def head_version(relpath):
    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{relpath}"],
            cwd=REPO, capture_output=True, text=True,
        )
        if out.returncode != 0:
            return None
        return json.loads(out.stdout)
    except Exception:
        return None


def main() -> int:
    problems = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_*.json"))):
        rel = os.path.basename(path)
        if rel.startswith("BENCH_r0") or rel.startswith("BENCH_r1"):
            continue  # per-round driver snapshots, not refreshable artifacts
        with open(path) as fp:
            try:
                doc = json.load(fp)
            except Exception as e:
                problems.append(f"{rel}: unreadable JSON ({e})")
                continue
        cur = _entries(doc)
        for metric, e in cur.items():
            if e.get("needs_note"):
                problems.append(
                    f"{rel}: {metric} flagged needs_note "
                    f"(moved {e.get('delta_vs_prev_pct')}% with no note)"
                )
        old_doc = head_version(rel)
        if old_doc is not None:
            for metric, e in cur.items():
                old = _entries(old_doc).get(metric)
                if not old or not old.get("value"):
                    continue
                delta = 100.0 * (e["value"] - old["value"]) / old["value"]
                covered = abs(delta) <= max(
                    10.0, float(e.get("spread_pct", 0.0))
                )
                if not covered and "note" not in e:
                    problems.append(
                        f"{rel}: {metric} moved {delta:+.1f}% vs HEAD "
                        f"({old['value']} -> {e['value']}) with no note"
                    )
    # internal coherence: loop-level step time >= raw step time
    train = os.path.join(REPO, "BENCH_train.json")
    if os.path.exists(train):
        with open(train) as fp:
            cur = _entries(json.load(fp))
        raw = cur.get("samplernn3_train_samples_per_sec", {})
        loop = cur.get("samplernn3_train_loop_samples_per_sec", {})
        if raw.get("ms_per_step") and loop.get("ms_per_step"):
            if loop["ms_per_step"] < raw["ms_per_step"]:
                problems.append(
                    "BENCH_train.json: loop-level "
                    f"{loop['ms_per_step']} ms/step < raw "
                    f"{raw['ms_per_step']} ms/step — incompatible runs "
                    "committed together (a loop cannot beat its own step)"
                )
    if problems:
        print("ARTIFACT CHECK FAILED:")
        for p in problems:
            print("  -", p)
        return 1
    print("artifact check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
