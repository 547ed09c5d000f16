#!/usr/bin/env python3
"""Per-query regression check against in-repo bench history.

Usage: python3 tools/bench_trend.py [trend_file] [--sf SFDIR] [--factor 2.0]

Reads bench_trend.jsonl (appended by graft.Bench on every full run),
compares the latest entry for the chosen sf against the minimum of all
earlier entries for the same sf, and reports queries slower by more than
--factor AND more than 0.5s absolute (tiny queries jitter multiplicatively).

Exit status 1 if any regression is flagged, so the round workflow can gate
on it. Load-average metadata is printed so a contaminated run (high load)
is visible next to its numbers.

Dev/round tool only — the engine itself has no Python dependency.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "bench_trend.jsonl"
sf = None
factor = 2.0
abs_floor = 0.5
args = sys.argv[1:]
for i, a in enumerate(args):
    if a == "--sf" and i + 1 < len(args):
        sf = args[i + 1]
    if a == "--factor" and i + 1 < len(args):
        factor = float(args[i + 1])

try:
    entries = [json.loads(l) for l in open(path) if l.strip()]
except FileNotFoundError:
    print(f"no trend history at {path}; nothing to compare")
    sys.exit(0)

if sf is None:
    sf = entries[-1]["sf"]
# entries recorded under a different materializer are not comparable:
# the fingerprint action evaluates projection work count() pruned, so a
# cross-materializer diff books the methodology change as a regression
mat = entries[-1].get("materializer", "count")
hist = [e for e in entries
        if e["sf"] == sf and e.get("materializer", "count") == mat]
if len(hist) < 2:
    print(f"only {len(hist)} entr{'y' if len(hist)==1 else 'ies'} for {sf} "
          f"(materializer={mat}); need 2+ to compare")
    sys.exit(0)

latest, prior = hist[-1], hist[:-1]
best = {}
for e in prior:
    for q, t in e["queries"].items():
        best[q] = min(best.get(q, float("inf")), t)

if latest.get("canary_hot"):
    print("NOTE: latest run is CANARY-HOT (par-canary >20% above the "
          "trailing-best host state) — its per-query times are inflated "
          "by host drift; do not adopt it as a clean baseline")

print(f"latest run: total={latest.get('total')}s "
      f"load_avg={latest.get('load_avg_start')}->{latest.get('load_avg_end')} "
      f"warmup={latest.get('warmup_sec')}s over {len(prior)} prior run(s)")

# host/harness context: a canary drift explains a uniform slowdown (host),
# a stream-null drift explains an st-family-wide shift (micro-batch
# scheduling overhead, not the fold code). Both printed next to the
# numbers so a reader attributes before chasing per-query ghosts.
prior_canary = [e for e in prior if "canary_single_sec" in e]
if prior_canary and "canary_single_sec" in latest:
    p = prior_canary[-1]
    same_threads = (p.get("canary_threads") is not None
                    and p.get("canary_threads") == latest.get("canary_threads"))
    par = (f"par={p.get('canary_par_sec')}->{latest.get('canary_par_sec')}"
           if same_threads else
           f"par n/c (threads {p.get('canary_threads')}->"
           f"{latest.get('canary_threads')})")
    print(f"host canary: single={p['canary_single_sec']}->"
          f"{latest['canary_single_sec']} {par}")
prior_null = [e for e in prior if "stream_null_sec" in e]
if "stream_null_sec" in latest:
    prev_null = prior_null[-1]["stream_null_sec"] if prior_null else None
    print(f"stream null canary: {prev_null}->{latest['stream_null_sec']}s "
          "(fixed micro-batch overhead; read st timings net of this)")

# st-family net baseline: min over runs of (that run's time - that SAME
# run's stream_null_sec). Pairing a global-min time with a global-min
# overhead could mix two different runs and mis-net the baseline.
best_net = {}
for e in prior_null:
    null_e = e["stream_null_sec"]
    for q, t in e["queries"].items():
        if q.startswith("st"):
            best_net[q] = min(best_net.get(q, float("inf")),
                              max(t - null_e, 0.05))

regressed = []
null_latest = latest.get("stream_null_sec")
for q, t in sorted(latest["queries"].items()):
    if q not in best:
        continue
    b, tt = best[q], t
    # st-family: compare NET of each run's own null-stream overhead when
    # both sides carry the field — otherwise a scheduling-overhead shift
    # books as a regression in every stream query at once
    if q.startswith("st") and null_latest is not None and q in best_net:
        b = best_net[q]
        tt = max(t - null_latest, 0.05)
    if tt > factor * b and tt - b > abs_floor:
        regressed.append((q, best[q], t))

if not regressed:
    print(f"OK: no query regressed >{factor}x (+{abs_floor}s) vs history")
    sys.exit(0)
print(f"REGRESSED ({len(regressed)}):")
for q, b, t in regressed:
    print(f"  {q}: {b:.3f}s -> {t:.3f}s ({t/b:.1f}x)")
sys.exit(1)
