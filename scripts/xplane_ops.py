"""Parse a jax.profiler .xplane.pb into per-op device self-times.

No xprof/tensorboard dependency: XSpace is decoded with a minimal
protobuf wire-format reader (field numbers from
tsl/profiler/protobuf/xplane.proto). Prints, per device plane and line,
the total duration by event name — enough to attribute a step's time to
HLO ops / fusions on the real chip, which is what the 125M/chip roofline
work needs (RESULTS.md round-3 accounting).

Usage:
  python scripts/xplane_ops.py /tmp/trace/plugins/profile/*/xx.xplane.pb \
      [--line "XLA Ops"] [--top 40] [--merge]

--merge folds fusion instances (name.N suffixes) together.
"""

from __future__ import annotations

import argparse
import collections
import glob
import re
import sys


def _varint(buf: bytes, i: int):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_line(buf: bytes):
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 11 and wt == 2:
            name = v.decode("utf-8", "replace") or name
        elif fn == 4 and wt == 2:
            events.append(v)
    return name, events


def parse_plane(buf: bytes):
    """-> (plane_name, {line_name: [(metadata_id, duration_ps), ...]},
          {metadata_id: event_name})"""
    pname = ""
    lines = {}
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            pname = v.decode("utf-8", "replace")
        elif fn == 3 and wt == 2:
            lname, events = parse_line(v)
            evs = lines.setdefault(lname, [])
            for ev in events:
                mid = dur = 0
                for efn, ewt, evv in fields(ev):
                    if efn == 1 and ewt == 0:
                        mid = evv
                    elif efn == 3 and ewt == 0:
                        dur = evv
                evs.append((mid, dur))
        elif fn == 4 and wt == 2:
            # map<int64, XEventMetadata>: entry {key=1, value=2}
            key = None
            em = None
            for efn, ewt, evv in fields(v):
                if efn == 1 and ewt == 0:
                    key = evv
                elif efn == 2 and ewt == 2:
                    em = evv
            if em is not None:
                mname = ""
                for mfn, mwt, mv in fields(em):
                    if mfn == 2 and mwt == 2:
                        mname = mv.decode("utf-8", "replace")
                    elif mfn == 4 and mwt == 2 and not mname:
                        mname = mv.decode("utf-8", "replace")
                meta[key] = mname
    return pname, lines, meta


def parse_xspace(path: str):
    buf = open(path, "rb").read()
    planes = []
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 2:
            planes.append(parse_plane(v))
    return planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--line", default=None,
                    help="only lines whose name contains this")
    ap.add_argument("--plane", default=None,
                    help="only planes whose name contains this")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--merge", action="store_true",
                    help="fold name.N / name_N.M instance suffixes")
    args = ap.parse_args()

    paths = []
    for p in args.paths:
        paths.extend(sorted(glob.glob(p)))
    if not paths:
        sys.exit("no xplane files matched")

    for path in paths:
        print(f"== {path}")
        for pname, lines, meta in parse_xspace(path):
            if args.plane and args.plane not in pname:
                continue
            for lname, evs in lines.items():
                if args.line and args.line not in lname:
                    continue
                if not evs:
                    continue
                agg = collections.Counter()
                cnt = collections.Counter()
                for mid, dur in evs:
                    name = meta.get(mid, f"#{mid}")
                    if args.merge:
                        name = re.sub(r"[._]\d+$", "", name)
                    agg[name] += dur
                    cnt[name] += 1
                total = sum(agg.values())
                print(f"-- plane '{pname}' line '{lname}': "
                      f"{total / 1e9:.3f} ms total, {len(evs)} events")
                for name, ps in agg.most_common(args.top):
                    print(f"  {ps / 1e9:9.3f} ms {100 * ps / max(total, 1):5.1f}% "
                          f"x{cnt[name]:<5d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
