"""Timeline view of one XLA module execution from an xplane.pb trace.

Shows ops of the chosen module occurrence sorted by offset, with
durations and inter-op gaps, separating the sync 'XLA Ops' line from
'Async XLA Ops'. Usage:
  python tools/xplane_timeline.py <xplane.pb> <module-substr> [occurrence]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from xplane_dump import fields, parse_meta  # noqa: E402


def parse_event_full(buf):
    mid = dur = off = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return mid, off, dur


def main():
    path, sub = sys.argv[1], sys.argv[2]
    occ = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    buf = open(path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1:
            continue
        name = ""
        meta = {}
        lines = {}
        for f2, _, v2 in fields(v):
            if f2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 4:
                for f3, _, v3 in fields(v2):
                    if f3 == 2:
                        mid, mname = parse_meta(v3)
                        meta[mid] = mname
            elif f2 == 3:
                lname = ""
                evs = []
                for f3, _, v3 in fields(v2):
                    if f3 == 2:
                        lname = v3.decode("utf-8", "replace")
                    elif f3 == 4:
                        evs.append(parse_event_full(v3))
                lines[lname] = evs
        if "TPU" not in name:
            continue
        mods = [(off, dur, meta[mid]) for mid, off, dur in
                lines.get("XLA Modules", []) if sub in meta.get(mid, "")]
        mods.sort()
        if not mods:
            continue
        m_off, m_dur, m_name = mods[occ]
        print(f"MODULE {m_name}  dur={m_dur/1e9:.3f} ms")
        for lname in ("XLA Ops", "Async XLA Ops"):
            evs = [(off, dur, meta[mid]) for mid, off, dur in
                   lines.get(lname, [])
                   if m_off <= off < m_off + m_dur]
            evs.sort()
            print(f"--- {lname} ({len(evs)} events)")
            prev_end = m_off
            for off, dur, nm in evs:
                gap = (off - prev_end) / 1e9
                tag = f" gap={gap:7.3f}" if gap > 0.005 else "          "
                print(f"  t={(off-m_off)/1e9:8.3f} d={dur/1e9:7.3f}{tag}  "
                      f"{nm[:95]}")
                prev_end = max(prev_end, off + dur)
        break


if __name__ == "__main__":
    main()
