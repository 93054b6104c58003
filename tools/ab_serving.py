"""Same-day serving A/B: HEAD vs a pinned commit (r17 verdict #1).

BENCH_r17 recorded serve_qps 3.1 (r16: 10.6) and mixed_qps 0.9 (r16:
1.7) from a session whose loadavg started at 9.9, while same-day
uncommitted reruns looked fine — the repo's own cross_round_note
protocol ("verify regressions by re-benching the prior commit
same-day") exists for exactly this.  This script runs the serving +
facade_full probes INTERLEAVED (old, head, old, head) from two source
trees on the same host-day, each probe bracketed by its own canary and
loadavg samples, and writes the pair into BENCH_LOCAL.json as
``ab_serving_note``.

Usage:  python3 tools/ab_serving.py [commit] [reps]
        (default commit bd1dbcd = the r16 judge commit, reps 2)
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_probe(tree: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ab_serving_probe.py")],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(p.stderr[-2000:])
    m = re.search(r"AB_PROBE_JSON:(\{.*\})", p.stdout.replace("\r", "\n"))
    if not m:
        raise RuntimeError(
            f"probe in {tree} produced no JSON; stdout tail: "
            + p.stdout[-2000:]
        )
    return json.loads(m.group(1))


def main() -> None:
    commit = sys.argv[1] if len(sys.argv) > 1 else "bd1dbcd"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wt = f"/tmp/ab_tree_{commit}"
    if not os.path.exists(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO, check=True,
        )
    scratch = os.path.join(wt, ".scratch")
    if not os.path.exists(scratch):
        os.symlink(os.path.join(REPO, ".scratch"), scratch)

    sides = {"old": wt, "head": REPO}
    results: dict[str, list] = {"old": [], "head": []}
    for rep in range(reps):
        for name in ("old", "head"):
            print(f"--- rep {rep} side {name}", file=sys.stderr)
            results[name].append(run_probe(sides[name]))

    note = {
        "commit_old": commit,
        "reps": reps,
        "interleaved": "old,head per rep — same host-day by construction",
        "old": results["old"],
        "head": results["head"],
    }
    out = os.path.join(REPO, ".scratch", f"ab_serving_{commit}.json")
    with open(out, "w") as f:
        json.dump(note, f, indent=1)
    print(json.dumps(note, indent=1))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
