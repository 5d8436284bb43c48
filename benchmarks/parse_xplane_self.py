"""Self-time (leaf) attribution from a jax.profiler xplane trace.

`parse_xplane.py` sums raw event durations, which double-counts when
events nest (a `while` op's duration includes every child fusion that
executes inside it).  This variant computes *self* time per event —
duration minus the duration of nested children on the same timeline —
so per-line totals add up to the real wall time.

Usage:
  python benchmarks/parse_xplane_self.py /tmp/prof --hlo /tmp/hlo.txt \
      --steps N [--top 40]
"""

import argparse
import collections
import glob
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--hlo", default=None)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    src = {}
    if args.hlo:
        pat = re.compile(
            r"%(\S+?) = .*?source_file=\"([^\"]+)\" source_line=(\d+)"
        )
        for m in pat.finditer(open(args.hlo).read()):
            name, f, l = m.groups()
            src[name] = f.split("/")[-1] + ":" + l

    fns = glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True)
    if not fns:
        raise SystemExit(f"no xplane.pb under {args.trace_dir}")
    agg = collections.Counter()
    cnt = collections.Counter()
    total_ps = 0
    for fn in fns:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fn, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                evs = []
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    name = md.display_name or md.name
                    evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                                name))
                evs.sort(key=lambda t: (t[0], -t[1]))
                # stack-based self-time: child intervals are contained in
                # parent intervals on the same timeline
                stack = []  # (end, name, child_ps)
                def pop_close(upto):
                    while stack and stack[-1][0] <= upto:
                        end, name, child = stack.pop()
                        dur = end - stack_start.pop()
                        self_ps = dur - child
                        key = src.get(name) if args.hlo else name
                        if key is None:
                            key = "<unattributed:" + name.split(".")[0] + ">"
                        agg[key] += self_ps
                        cnt[key] += 1
                        if stack:
                            stack[-1][2] += dur
                        nonlocal_total[0] += self_ps
                stack_start = []
                nonlocal_total = [0]
                for s, e, name in evs:
                    pop_close(s)
                    stack.append([e, name, 0])
                    stack_start.append(s)
                pop_close(float("inf"))
                total_ps += nonlocal_total[0]
    print(f"# total device self-time: {total_ps/args.steps/1e9:.2f} ms/step")
    for k, ps in agg.most_common(args.top):
        print(f"{ps / args.steps / 1e9:9.2f} ms/step {cnt[k]:7d}x  {k}")


if __name__ == "__main__":
    main()
