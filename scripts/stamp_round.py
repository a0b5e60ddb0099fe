#!/usr/bin/env python3
"""Single writer for the stamped per-round bench artifacts.

Runs the full bench (SQL sweep + replay throughput) via sbt, validates the
generated JSON carries the FULL parsed per-query map and the replay
{best, median, spread} triple, then stamps BENCH_LOCAL_r{N}.json and
REPLAY_BENCH_r{N}.json from the same bytes and rewrites README's coverage
counts from the artifact. One writer: the generated files (git-ignored),
the stamped artifacts, and the README numbers cannot drift apart.

Usage:
    python3 scripts/stamp_round.py <round>               # run bench, then stamp
    python3 scripts/stamp_round.py <round> --skip-bench  # stamp existing outputs
"""
import json, re, shutil, subprocess, sys

rnd = int(sys.argv[1])
if '--skip-bench' not in sys.argv:
    subprocess.run(['sbt', '-batch', 'runMain graft.Bench'], check=True)

with open('bench_out.json') as f:
    bench = json.load(f)
with open('replay_bench.json') as f:
    replay = json.load(f)

# freshness: Bench writes replay_bench.json best-effort BEFORE the sweep
# (a replay failure must not kill the query sweep), so a failed replay
# leaves a stale file behind — refuse to stamp round N-1 throughput as
# round N. Bench embeds ONE run_id in both artifacts; they come from the
# same invocation iff the ids match. (Replaces the old mtime-window
# inference, which falsely aborted on >30-min sweeps and was meaningless
# on fresh checkouts/copies with reset mtimes.)
bench_id = bench.get('run_id')
replay_id = replay.get('run_id')
assert bench_id, 'bench_out.json carries no run_id — regenerate with current Bench'
assert replay_id, ('replay_bench.json carries no run_id — stale artifact from a '
                   'previous run (the replay pass likely failed); not stamping')
assert bench_id == replay_id, (
    f'run_id mismatch: bench_out.json {bench_id} vs replay_bench.json '
    f'{replay_id} — artifacts are from different runs; not stamping')

# the round-7/8 advice item: a stamped artifact must hold the full parsed
# per-query map, not a truncated stdout tail
assert bench.get('queries'), 'bench_out.json has no per-query map'
assert bench.get('timings'), 'bench_out.json has no per-attempt timings'
missing = set(bench['queries']) - set(bench['timings'])
assert not missing, f'timings missing for {sorted(missing)}'
assert bench['n_queries'] == len(bench['queries'])
for key in ('median_seconds', 'best_seconds', 'settled_spread', 'passes'):
    assert key in replay, f'replay_bench.json missing {key}'

shutil.copyfile('bench_out.json', f'BENCH_LOCAL_r{rnd:02d}.json')
shutil.copyfile('replay_bench.json', f'REPLAY_BENCH_r{rnd:02d}.json')

# README coverage counts derive from the artifact (Bench publishes
# n_registered/n_oracle straight from SparkEntry)
n_reg = bench.get('n_registered')
n_orc = bench.get('n_oracle')
if n_reg and n_orc:
    with open('README.md') as f:
        readme = f.read()
    new = re.sub(r'make \d+ of the \d+ queries hash-verifiable',
                 f'make {n_orc} of the {n_reg} queries hash-verifiable', readme)
    new = re.sub(r'\(the other \d+ are declared rows-only',
                 f'(the other {n_reg - n_orc} are declared rows-only', new)
    if new != readme:
        with open('README.md', 'w') as f:
            f.write(new)
        print(f'README counts refreshed: {n_orc}/{n_reg} hash-verifiable')

print(f"stamped BENCH_LOCAL_r{rnd:02d}.json "
      f"({bench['n_queries']} queries, {bench['n_failed']} failed, "
      f"{bench['value']:.1f}s total) and REPLAY_BENCH_r{rnd:02d}.json "
      f"(median {replay['median_seconds']}s, best {replay['best_seconds']}s, "
      f"settled spread {replay['settled_spread']}x)")
