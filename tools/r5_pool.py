#!/usr/bin/env python3
"""Pool the round-5 ScalingBench pairs from data/r5_validation.log.

Pooled efficiency per metric = (sum of 16-core throughputs over pairs /
sum of 4-core throughputs) / 4 (equivalently, the ratio of pooled means);
per-pair values and the median are printed too, plus the per-phase
decomposition (exchange wall, write-only wall) that attributes the
ByBucket sink and whole-job numbers.
"""
import json, sys, statistics

log = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/data/r5_validation.log'
rows = []
for line in open(log, errors='replace'):
    line = line.strip()
    if line.startswith('{"bench":"scaling"'):
        rows.append(json.loads(line))
pairs = [(rows[i], rows[i+1]) for i in range(0, len(rows) - 1, 2)
         if rows[i]['cpus'] == 4 and rows[i+1]['cpus'] == 16]
print(f'{len(pairs)} pairs')

metrics = ['parse', 'scan', 'shuffle', 'sink', 'filesink']
for m in metrics:
    k = m + '_docs_per_sec'
    effs = [(hi[k] / lo[k]) / 4 for lo, hi in pairs]
    pooled = (sum(hi[k] for _, hi in pairs) / sum(lo[k] for lo, _ in pairs)) / 4
    print(f'{m:10} pooled={pooled:.3f} median={statistics.median(effs):.3f} '
          f'pairs={[round(e,3) for e in effs]}')

# write-phase (scan+parse+write inside run()) and whole-job details
for name, key in [('writeonly', 'write_sec')]:
    effs = [((lo[key]) / (hi[key])) / 4 for lo, hi in pairs]
    pooled = (sum(lo[key] for lo, _ in pairs) / sum(hi[key] for _, hi in pairs)) / 4
    print(f'{name:10} pooled={pooled:.3f} median={statistics.median(effs):.3f} '
          f'pairs={[round(e,3) for e in effs]}')

# decomposition walls (mean over pairs)
def mean(key, which):
    return statistics.mean((p[0] if which == 4 else p[1])[key] for p in pairs)
for lvl in (4, 16):
    ex = mean('shuffle_sec', lvl) - mean('parse_sec', lvl)
    wr = mean('sink_sec', lvl) - mean('shuffle_sec', lvl)
    tail = mean('filesink_sec', lvl) - mean('write_sec', lvl)
    print(f'@{lvl:2}c: parse={mean("parse_sec",lvl):.1f}s scan={mean("scan_sec",lvl):.2f}s '
          f'exchange={ex:.1f}s parquet_write={wr:.1f}s '
          f'fs_write_phase={mean("write_sec",lvl):.1f}s fs_metrics={mean("metrics_sec",lvl):.2f}s '
          f'fs_untimed_tail={tail - mean("metrics_sec",lvl) - mean("commit_sec",lvl):.2f}s')
