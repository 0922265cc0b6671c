"""Minimal XSpace/XPlane protobuf reader for jax.profiler traces.

The axon TPU plugin exports device timelines only in the binary
``*.xplane.pb`` (the ``trace.json.gz`` holds host-side Python events
only), and the usual parser (tensorboard_plugin_profile) is not in this
image -- so walk the wire format directly. Schema (tsl/profiler
xplane.proto):

    XSpace  { repeated XPlane planes = 1; }
    XPlane  { int64 id=1; string name=2; repeated XLine lines=3;
              map<int64,XEventMetadata> event_metadata=4;
              map<int64,XStatMetadata> stat_metadata=5; }
    XLine   { int64 id=1; string name=2; int64 timestamp_ns=3;
              repeated XEvent events=4; ... }
    XEvent  { int64 metadata_id=1; int64 offset_ps=2;
              int64 duration_ps=3 | num_occurrences...; }
    XEventMetadata { int64 id=1; string name=2; ... }

Only fields needed for an op-time rollup are decoded.
"""

import struct


def _read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def _parse_event(buf):
    mid = dur = 0
    for fn, _, v in _fields(buf):
        if fn == 1:
            mid = v
        elif fn == 3:
            dur = v
    return mid, dur


def _parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4 and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fn, _, v in _fields(buf):
        if fn == 1:
            key = v
        elif fn == 2:  # XEventMetadata
            for fn2, _, v2 in _fields(v):
                if fn2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, _, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(_parse_line(v))
        elif fn == 4:
            k, nm = _parse_meta_entry(v)
            meta[k] = nm
    return name, lines, meta


def parse_xspace(path):
    """-> [(plane_name, [(line_name, [(event_name, duration_ps), ...])])]"""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fn, _, v in _fields(buf):
        if fn == 1:
            name, lines, meta = _parse_plane(v)
            planes.append((name, [
                (ln, [(meta.get(mid, str(mid)), dur) for mid, dur in evs])
                for ln, evs in lines]))
    return planes


def device_op_rollup(path, plane_filter="TPU"):
    """Aggregate device-plane events: {op_name: total_seconds}."""
    total = {}
    for pname, lines in parse_xspace(path):
        if plane_filter not in pname:
            continue
        for lname, evs in lines:
            for name, dur in evs:
                total[name] = total.get(name, 0) + dur * 1e-12
    return total


if __name__ == "__main__":
    import sys

    path = sys.argv[1]
    for pname, lines in parse_xspace(path):
        tot = sum(d for _, evs in lines for _, d in evs)
        print(f"== plane {pname!r}: {len(lines)} lines, "
              f"{tot * 1e-9:.3f} ms total")
        for lname, evs in lines:
            t = sum(d for _, d in evs) * 1e-9
            print(f"   line {lname!r}: {len(evs)} events, {t:.3f} ms")
