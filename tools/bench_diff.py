#!/usr/bin/env python3
"""Diff two graft.Bench JSON outputs: per-query wall/cpu deltas.

Usage: python3 tools/bench_diff.py before.json after.json [min_delta_sec]
"""
import json
import sys


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('{'):
            d = json.loads(line)
            if d.get('metric') == 'total' and 'detail' in d:
                return d
    raise SystemExit(f'no detail line in {path}')


def main():
    a = load(sys.argv[1])
    b = load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    da, db = a['detail'], b['detail']
    rows = []
    for k in sorted(set(da) | set(db)):
        wa = da.get(k, {}).get('wall')
        wb = db.get(k, {}).get('wall')
        ca = da.get(k, {}).get('cpu')
        cb = db.get(k, {}).get('cpu')
        if wa is None or wb is None:
            rows.append((0, k, wa, wb, ca, cb, 'MISSING'))
            continue
        rows.append((wb - wa, k, wa, wb, ca, cb, ''))
    rows.sort(key=lambda r: r[0])
    print(f"{'query':44s} {'wall_b':>7} {'wall_a':>7} {'d_wall':>7} "
          f"{'cpu_b':>7} {'cpu_a':>7}")
    for d, k, wa, wb, ca, cb, note in rows:
        if note or abs(d) >= thresh:
            print(f"{k:44s} {wa or -1:7.2f} {wb or -1:7.2f} {d:+7.2f} "
                  f"{ca or -1:7.1f} {cb or -1:7.1f} {note}")
    ta = sum(abs(v['wall']) for v in da.values())
    tb = sum(abs(v['wall']) for v in db.values())
    ca = sum(v['cpu'] for v in da.values())
    cb = sum(v['cpu'] for v in db.values())
    print(f"\nTOTAL wall {ta:.1f} -> {tb:.1f}  ({tb-ta:+.1f}); "
          f"cpu {ca:.0f} -> {cb:.0f} ({cb-ca:+.0f})")


if __name__ == '__main__':
    main()
