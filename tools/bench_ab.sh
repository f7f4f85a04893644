#!/usr/bin/env bash
# Same-window bench A/B against a prior ref (SURVEY §6.1[^h11], r11).
#
# The only decisive way to attribute a cross-round bench `value` delta on
# this host: delivered capacity swings ~1.3-1.5x between windows with every
# single-threaded probe (load average, ALU loop, memory stream) reading
# idle-fast, so "wait for a quiet window and compare" conflates code with
# host. This script rebuilds REF in a clean worktree and benches it NOW,
# in the same window as HEAD's most recent bench_full.json, then prints
# the median like-for-like ratio — ~1.0 means the delta is the host.
#
# Usage: tools/bench_ab.sh <ref> [sf-dir]
#   e.g. tools/bench_ab.sh 0ba61e1 /root/testdata/sf0.1
#
# Cost: one compile (~1 min) + one full bench (~7 min at sf0.1).
# The worktree benches with ITS OWN code (including its own warmup/wipe
# protocol) — protocol deltas between refs show up in derived_builds_total
# and warmup handling, so read the per-query median, not just `value`.
set -euo pipefail
REF="${1:?usage: tools/bench_ab.sh <ref> [sf-dir]}"
SF="${2:-/root/testdata/sf0.1}"
ROOT="$(git rev-parse --show-toplevel)"
# Resolve the ref to a short sha BEFORE building paths (ADVICE r11): a ref
# with a slash (origin/main, feature/x) embedded verbatim would nest the
# worktree path and the cleanup trap would miss it.
REF_SHA="$(git -C "$ROOT" rev-parse --short "$REF")"
WT="$ROOT/.wt_ab_$REF_SHA"
cleanup() { git -C "$ROOT" worktree remove --force "$WT" 2>/dev/null || true; }
trap cleanup EXIT
[ -f "$ROOT/bench_full.json" ] || {
  echo "run the HEAD bench first (bench_full.json missing)" >&2; exit 1; }
# Same-window guard (VERDICT r11 item 2): the whole attribution rests on
# HEAD's artifact being from THIS window — the host band demonstrably
# drifts within the hour. Refuse a stale artifact rather than silently
# voiding the premise; re-bench HEAD first (or override explicitly).
AGE=$(( $(date +%s) - $(stat -c %Y "$ROOT/bench_full.json") ))
MAX_AGE="${BENCH_AB_MAX_AGE_SEC:-1800}"
if [ "$AGE" -gt "$MAX_AGE" ]; then
  echo "bench_full.json is ${AGE}s old (> ${MAX_AGE}s): the same-window" >&2
  echo "premise is void. Re-bench HEAD first, or set" >&2
  echo "BENCH_AB_MAX_AGE_SEC=$((AGE + 60)) to override knowingly." >&2
  exit 1
fi
git -C "$ROOT" worktree add "$WT" "$REF_SHA"
( cd "$WT" && sbt -batch compile >/dev/null 2>&1 )
( cd "$WT" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" \
    > "$WT/bench_ab.out" 2> "$WT/bench_ab.err" )
# The staleness guard above ran at script START; the ref rebuild+bench
# takes ~20+ min, so at comparison time the HEAD artifact is older than
# the guard saw. Acceptable for a serial A/B by construction (the two
# readings still bracket one contiguous window), but record the ACTUAL
# skew next to the median so the reading carries it (ADVICE r12).
HEAD_AGE=$(( $(date +%s) - $(stat -c %Y "$ROOT/bench_full.json") ))
# Preserve the ref's full artifact OUTSIDE the worktree before the
# cleanup trap removes it — without this, any post-hoc per-query
# analysis (e.g. comparing the ref against a LATER head re-run to
# control for slot order) loses the data it needs (r13 lesson: the
# first A/B's ref map was deleted with the worktree and the order
# control had to re-bench the ref from scratch). Never overwrite an
# existing copy (ADVICE r13): an A-B-A-B sandwich runs the SAME ref
# twice, and clobbering slot 2's map with slot 4's is exactly the data
# loss this cp exists to prevent — suffix repeat runs with an index.
REF_OUT="$ROOT/bench_ab_ref_$REF_SHA.json"
n=2
while [ -e "$REF_OUT" ]; do
  REF_OUT="$ROOT/bench_ab_ref_$REF_SHA.run$n.json"
  n=$((n + 1))
done
cp "$WT/bench_full.json" "$REF_OUT"
echo "ref per-query artifact preserved: $REF_OUT" >&2
python3 - "$ROOT/bench_full.json" "$WT/bench_full.json" "$HEAD_AGE" <<'EOF'
import json, statistics, sys
head = json.load(open(sys.argv[1])); ref = json.load(open(sys.argv[2]))
head_age = int(sys.argv[3])
qh, qr = head['queries'], ref['queries']
shared = [k for k in qh if k in qr]
ratios = sorted(((k, qh[k]/qr[k]) for k in shared if qr[k] > 0.2),
                key=lambda kv: kv[1])
if not ratios:
    # Guard (ADVICE r11): renamed queries between refs would otherwise
    # crash statistics.median AFTER the ~20-min bench completed.
    sys.exit(f"no comparable queries ({len(shared)} shared keys, none "
             f"above the 0.2 s floor) — cannot compute a median; compare "
             f"the two bench_full.json files by hand.")
med = statistics.median(r for _, r in ratios)
print(f"HEAD value {head['value']} (builds {head.get('derived_builds_total')}, "
      f"load_start {head.get('load_start')})")
print(f"REF  value {ref['value']} (builds {ref.get('derived_builds_total')}, "
      f"load_start {ref.get('load_start')})")
print(f"median like-for-like HEAD/REF: {med:.3f} over {len(ratios)} queries "
      f"(HEAD artifact {head_age}s old at comparison — the window skew)")
print("largest regressions (HEAD/REF):")
for k, r in ratios[-8:][::-1]:
    print(f"  {k:30s} {qr[k]:7.2f} -> {qh[k]:7.2f}  x{r:.2f}")
print("interpretation: median ~1.0 -> host window; a tight cluster of")
print("large ratios on related queries -> chase those as code.")
EOF
