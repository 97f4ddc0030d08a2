"""Aggregate TPU op durations from a jax.profiler trace dir
(plugins/profile/<run>/*.trace.json.gz)."""
import collections
import glob
import gzip
import json
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace"
files = glob.glob(root + "/**/*.trace.json.gz", recursive=True)
if not files:
    sys.exit(f"no trace.json.gz under {root}")
path = max(files)
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data.get("traceEvents", [])
# keep only TPU device lanes (pid names like "/device:TPU:0" or "TPU:0 ...")
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

dur_by_name = collections.Counter()
cnt_by_name = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e["pid"], "")
    tname = tid_names.get((e["pid"], e.get("tid")), "")
    if "TPU" not in pname and "TPU" not in tname and "tpu" not in pname.lower():
        continue
    # XLA op lanes are usually named "XLA Ops" / "Steps"; take op lanes
    if "op" not in tname.lower() and "xla" not in tname.lower():
        continue
    d = float(e.get("dur", 0.0))
    name = e.get("name", "?")
    dur_by_name[name] += d
    cnt_by_name[name] += 1
    total += d

print(f"file: {path}")
print(f"total op-time: {total/1e3:.2f} ms (3 steps)")
for name, d in dur_by_name.most_common(40):
    print(f"{d/3e3:8.3f} ms/step  x{cnt_by_name[name]//3:<4d} {name[:110]}")
