"""Minimal XSpace/XPlane protobuf reader: aggregate device op durations.

No tensorflow dependency — hand-rolled varint/field parser over the
fixed XPlane schema (xplane.proto):

  XSpace{ repeated XPlane planes = 1 }
  XPlane{ id=1, name=2, repeated XLine lines=3,
          map<int64, XEventMetadata> event_metadata=4 }
  XLine{ id=1, name=2(str)... repeated XEvent events=4 }
  XEvent{ metadata_id=1, offset_ps=2, duration_ps=3 }
  XEventMetadata{ id=1, name=2 }

Usage: python tools/xplane_dump.py <file.xplane.pb> [top_n]
"""
import collections
import sys


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value_or_bytes)."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = read_varint(buf, pos)
            yield fno, wt, v
        elif wt == 1:
            yield fno, wt, buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            yield fno, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield fno, wt, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")


def parse_event(buf):
    mid = dur = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 3:
            dur = v
    return mid, dur


def parse_meta(buf):
    mid = 0
    name = ""
    for fno, wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def parse_plane(buf):
    name = ""
    meta = {}
    agg = collections.Counter()
    cnt = collections.Counter()
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 4:  # map entry {key=1, value=2: XEventMetadata}
            for f2, _, v2 in fields(v):
                if f2 == 2:
                    mid, mname = parse_meta(v2)
                    meta[mid] = mname
        elif fno == 3:  # XLine
            lname = ""
            evl = []
            for f2, _, v2 in fields(v):
                if f2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 4:  # XEvent
                    evl.append(v2)
            for v2 in evl:
                mid, dur = parse_event(v2)
                agg[(lname, mid)] += dur / 1e9
                cnt[(lname, mid)] += 1
    return name, meta, agg, cnt


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    buf = open(path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1:
            continue
        name, meta, agg, cnt = parse_plane(v)
        total = sum(agg.values())
        if not total:
            continue
        print(f"PLANE: {name}  ({total:.3f} ms total)")
        for (lname, mid), ms in agg.most_common(top):
            print(f"  {ms:9.3f} ms x{cnt[(lname, mid)]:4d}  [{lname[:12]}] "
                  f"{meta.get(mid, str(mid))[:100]}")


if __name__ == "__main__":
    main()
