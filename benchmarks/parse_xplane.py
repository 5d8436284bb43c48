"""Parse a jax.profiler xplane trace into per-op / per-source-line costs.

The workflow that drove the round-2 optimizations (DESIGN.md §9):

  1. capture:   with jax.profiler.trace("/tmp/prof"): <run N steps>
  2. (optional) dump the optimized HLO of the same program for source
     attribution:  jitted.lower(*args).compile().as_text()  — with the
     persistent compile cache configured this is a cache hit, not a
     recompile.
  3. attribute: python benchmarks/parse_xplane.py /tmp/prof \
                    [--hlo /tmp/hlo.txt] [--steps N]

Without --hlo, prints the top ops by device time (fusion.N names).
With --hlo, joins each op to its `source_file:line` metadata and
aggregates per line — the view that exposed the row-bound scatters,
the strided parity-view gathers, and the per-channel fold DMA storm.

Uses the xplane protobuf shipped inside tensorflow (tsl); no
tensorboard needed.
"""

import argparse
import collections
import glob
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--hlo", default=None, help="optimized HLO text file")
    p.add_argument("--steps", type=int, default=1,
                   help="steps traced (divides totals)")
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
    for fn in fns:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fn, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    name = md.display_name or md.name
                    key = src.get(name) if args.hlo else name
                    if key is None:
                        key = "<unattributed:" + name.split(".")[0] + ">"
                    agg[key] += ev.duration_ps
                    cnt[key] += 1
    for k, ps in agg.most_common(args.top):
        print(
            f"{ps / args.steps / 1e9:9.2f} ms/step {cnt[k]:7d}x  {k}"
        )


if __name__ == "__main__":
    main()
