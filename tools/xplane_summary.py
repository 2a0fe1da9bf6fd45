"""Summarize a JAX profiler xplane.pb (XSpace) without TF/tensorboard deps.

Minimal protobuf wire-format walk of the XSpace schema (tsl/profiler
xplane.proto field numbers):
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map),
  stat_metadata=5(map),stats=6}; XLine{id=1,name=2,events=4 — as emitted
  by the installed libtpu; upstream proto numbering differs};
  XEvent{metadata_id=1,offset_ps=2,duration_ps=3,stats=4,num_occurrences=5};
  XEventMetadata{id=1,name=2,display_name=3}.

Usage: python tools/xplane_summary.py <trace_dir_or_pb> [top_n]
Prints per-plane op-name totals (self-times are not separated; nested events
mean totals can exceed wall time — use the device plane's top line as wall).
"""

import glob
import os
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    lines = []
    emeta = {}
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(val)
        elif fnum == 4 and wt == 2:
            # map entry: key=1 varint, value=2 XEventMetadata
            k = None
            v = None
            for f2, w2, v2 in _fields(val):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    v = v2
            if v is not None:
                mname = ""
                mid = k
                for f3, w3, v3 in _fields(v):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2 and w3 == 2:
                        mname = v3.decode("utf-8", "replace")
                emeta[mid] = mname
    return name, lines, emeta


def summarize(path, top_n=30):
    pbs = ([path] if path.endswith(".pb")
           else glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True))
    for pb in pbs:
        buf = open(pb, "rb").read()
        print(f"== {pb} ({len(buf)/1e6:.1f} MB)")
        for fnum, wt, val in _fields(buf):
            if fnum != 1 or wt != 2:
                continue
            pname, lines, emeta = parse_plane(val)
            totals = defaultdict(int)
            counts = defaultdict(int)
            wall_ps = 0
            for lbuf in lines:
                lname = ""
                events = []
                for f2, w2, v2 in _fields(lbuf):
                    if f2 == 2 and w2 == 2:
                        lname = v2.decode("utf-8", "replace")
                    elif f2 == 4 and w2 == 2:
                        events.append(v2)
                line_total = 0
                for ebuf in events:
                    mid = dur = 0
                    for f3, w3, v3 in _fields(ebuf):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    totals[emeta.get(mid, f"meta{mid}")] += dur
                    counts[emeta.get(mid, f"meta{mid}")] += 1
                    line_total += dur
                wall_ps = max(wall_ps, line_total)
            if not totals:
                continue
            print(f"-- plane: {pname}  (busiest line {wall_ps/1e9:.3f} ms)")
            for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"   {t/1e9:10.3f} ms  x{counts[name]:<6} {name[:90]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
