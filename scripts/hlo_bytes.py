"""Rank ops in a scheduled TPU HLO text dump by PADDED output bytes.

The TPU tiled layout {...:T(a,b)} pads the minor two dims to (a, b)
multiples — a [1.2M, 16] f32 row-major table is physically 614 MB (4.8x
payload). This script finds where such blowups are materialized.

Usage: python scripts/hlo_bytes.py /tmp/bench_hlo.txt [min_mb]
(dump via scripts/dump_hlo.py on the chip)
"""
import math
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_hlo.txt"
min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
txt = open(path).read()
line_re = re.compile(
    r'^\s*(%?[\w\.\-]+) = (\([^)]*\)|[a-z0-9]+\[[^ ]+) (\w+)\(', re.M)

BYTES = {'f32': 4, 's32': 4, 'u32': 4, 'bf16': 2, 'u16': 2, 'f16': 2,
         'pred': 1, 's8': 1, 'u8': 1, 's16': 2, 'f64': 8}


def shape_bytes(shape):
    if shape.startswith('('):
        # tuple-typed (multi-output fusion): sum the component shapes
        return sum(shape_bytes(c) for c in re.findall(
            r'[a-z0-9]+\[[\d,]*\]\{[^}]*\}', shape))
    m = re.match(r'([a-z0-9]+)\[([\d,]*)\]\{([^}]*)\}', shape)
    if not m:
        return 0
    dt, dims, layout = m.groups()
    if not dims:
        return 0
    dims = [int(x) for x in dims.split(',')]
    bs = BYTES.get(dt, 4)
    tm = re.search(r'T\((\d+),(\d+)\)', layout)
    order = layout.split(':')[0]
    if tm and dims:
        t0, t1 = int(tm.group(1)), int(tm.group(2))
        mino = [int(x) for x in order.split(',') if x.strip().isdigit()]
        if len(mino) == len(dims) and len(dims) >= 2:
            lanes, subl = dims[mino[0]], dims[mino[1]]
            rest = 1
            for i, d in enumerate(dims):
                if i not in (mino[0], mino[1]):
                    rest *= d
            return (math.ceil(lanes / t1) * t1
                    * math.ceil(subl / t0) * t0 * rest * bs)
        if len(dims) == 1:
            return math.ceil(dims[0] / (t0 * t1)) * (t0 * t1) * bs
    n = 1
    for d in dims:
        n *= d
    return n * bs


rows = []
for m in line_re.finditer(txt):
    name, shape, op = m.groups()
    if op in ('parameter', 'constant', 'get-tuple-element', 'tuple',
              'bitcast'):
        continue
    b = shape_bytes(shape)
    if b > min_mb * 1e6:
        rows.append((b, op, name, shape[:100]))
rows.sort(reverse=True)
for b, op, name, shape in rows[:50]:
    print(f"{b/1e6:8.1f}MB {op:12s} {name[:42]:42s} {shape}")
print(len(rows), f"ops > {min_mb}MB; padded-bytes total "
      f"{sum(r[0] for r in rows)/1e9:.2f}GB")
