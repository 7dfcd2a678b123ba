"""Summarize a jax.profiler trace (xplane.pb) into per-op device time.

Aggregates TPU device-lane events by op/fusion name and prints the top
entries with total duration and occurrence counts — enough to see where a
train step's device time goes without TensorBoard (the image has the tsl
xplane proto but no profile plugin UI).

  python bench.py --profile_dir /tmp/trace --steps 5
  python tools/trace_summary.py /tmp/trace [--top 40] [--group]

--group folds XLA's fusion suffixes (fusion.123 -> fusion) and loop
iterations together for a coarser view.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def walk_lines(plane):
    for line in plane.lines:
        yield line


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group", action="store_true",
                   help="fold fusion.N suffixes together")
    p.add_argument("--plane", default="TPU",
                   help="substring of the device plane name to aggregate "
                   "(default TPU; use e.g. 'Host' for host threads)")
    p.add_argument("--line", default="",
                   help="restrict aggregation to lines whose name contains "
                   "this substring (e.g. 'XLA Ops' for the compute queue)")
    p.add_argument("--lines", action="store_true",
                   help="per-line (hardware queue) busy time + top ops, to "
                   "see what serializes vs overlaps")
    args = p.parse_args()

    pbs = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    # fallthrough below prints per-line (queue) busy time too when --lines

    if not pbs:
        print(f"no *.xplane.pb under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)
    xs = load_xspace(pbs[-1])

    print("planes:", [pl.name for pl in xs.planes], file=sys.stderr)

    if args.lines:
        for plane in xs.planes:
            if args.plane.lower() not in plane.name.lower():
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            print(f"== plane {plane.name}")
            for line in plane.lines:
                busy = sum(ev.duration_ps for ev in line.events) / 1e6  # us
                if not line.events:
                    continue
                lo = min(line.timestamp_ns * 1000 + ev.offset_ps for ev in line.events)
                hi = max(line.timestamp_ns * 1000 + ev.offset_ps + ev.duration_ps
                         for ev in line.events)
                span = (hi - lo) / 1e6
                tops = collections.Counter()
                for ev in line.events:
                    nm = re.sub(r"\.\d+", "", meta.get(ev.metadata_id, "?"))
                    tops[nm] += ev.duration_ps / 1e6
                top3 = "; ".join(f"{n[:60]}={int(v/1e3)}ms"
                                 for n, v in tops.most_common(3))
                print(f"  line '{line.name}' events={len(line.events)} "
                      f"busy={busy/1e3:.1f}ms span={span/1e3:.1f}ms | {top3}")
        return

    totals = collections.Counter()
    counts = collections.Counter()
    plane_span = {}
    for plane in xs.planes:
        if args.plane.lower() not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        lo, hi = None, None
        for line in walk_lines(plane):
            if args.line and args.line.lower() not in line.name.lower():
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                if args.group:
                    name = re.sub(r"\.\d+", "", name)
                dur_us = ev.duration_ps / 1e6
                totals[name] += dur_us
                counts[name] += 1
                t0 = line.timestamp_ns * 1000 + ev.offset_ps
                t1 = t0 + ev.duration_ps
                lo = t0 if lo is None else min(lo, t0)
                hi = t1 if hi is None else max(hi, t1)
        if lo is not None:
            plane_span[plane.name] = (hi - lo) / 1e6  # us

    if not totals:
        print("no events matched; planes above", file=sys.stderr)
        sys.exit(1)
    span = sum(plane_span.values())
    print(f"device span: {span/1e3:.1f} ms over planes {list(plane_span)}")
    print(f"{'total ms':>10} {'n':>6} {'avg us':>9}  op")
    for name, us in totals.most_common(args.top):
        print(f"{us/1e3:10.2f} {counts[name]:6d} {us/counts[name]:9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
