"""Aggregate an xplane device trace BY SOURCE LINE using the HLO dump.

tools/trace_step.py prints top ops by name (fusion.NNN), which hides
where the time lives.  This joins the trace against the optimized HLO
text (tools/dump_hlo.py writes it) to attribute every op's device time
to its `source_file:source_line` metadata, then prints per-file and
per-line totals.  Module-level ops (jit_step, whiles) carry no useful
source and are skipped from attribution but reported separately.

Run after: python tools/dump_hlo.py && python tools/trace_step.py 480x640 default /tmp/jax_trace_r3
  python tools/trace_by_source.py /tmp/jax_trace_r3 /tmp/step_hlo.txt [n_steps=5]
"""
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_proto"))
import xplane_pb2  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_r3"
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    # op name -> (file, line, op_kind) from HLO metadata.
    src = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{[^}]*?op_name=\"([^\"]*)\""
        r"(?:[^}]*?source_file=\"([^\"]*)\")?"
        r"(?:[^}]*?source_line=(\d+))?"
    )
    with open(hlo_path) as f:
        for ln in f:
            m = pat.search(ln)
            if m:
                name, opname, sf, sl = m.groups()
                src[name] = (sf or "?", sl or "?", opname.split("/")[-1])

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    with open(paths[-1], "rb") as f:
        xspace = xplane_pb2.XSpace.FromString(f.read())

    by_line = defaultdict(float)
    by_file = defaultdict(float)
    unattributed = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                # strip leading % if present
                key = name.lstrip("%").split(" ")[0]
                dur = ev.duration_ps / 1e9 / n_steps  # ms per step
                # Skip module/while wrappers (double counting).
                if key.startswith(("jit_", "while")):
                    continue
                info = src.get(key)
                if info is None:
                    unattributed[key] += dur
                    continue
                sf, sl, kind = info
                sfs = sf.split("/")[-1]
                by_line[f"{sfs}:{sl} ({kind})"] += dur
                by_file[sfs] += dur

    print("=== per-file device ms / step ===")
    for k, v in sorted(by_file.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f} ms  {k}")
    print(f"{sum(unattributed.values()):8.3f} ms  [unattributed]")
    print("\n=== top source lines ===")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.3f} ms  {k}")
    print("\n=== top unattributed ops ===")
    for k, v in sorted(unattributed.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
