"""From-scratch ISO BMFF (MP4) container: mux + demux for MJPEG samples.

Closes the last video-container stub: ``video/mp4`` blobs whose track
carries JPEG samples (QuickTime-style ``jpeg`` visual sample entry) are
now REAL — built and parsed with the stdlib alone, no codec library.
What stays env-blocked is the h264/HEVC *bitstream* decode; the container
layer (box tree, sample tables, frame clock) is the part a curation
pipeline needs to sample frames, and that part is fully owned here.

Demux walks the box tree (32-bit, 64-bit ``largesize`` and size-0
to-end-of-file boxes), picks the first ``vide`` track, and rebuilds the
sample byte ranges from the four sample tables the spec splits them
across: ``stts`` (decode deltas -> frame clock), ``stsz`` (sizes),
``stsc`` (chunk runs), ``stco``/``co64`` (chunk offsets). The contract
matches ``demux_mjpeg_avi``: ``(microseconds_per_frame, [frame bytes])``.

Mux writes ``ftyp | mdat | moov`` — mdat BEFORE moov so chunk offsets are
known without a second pass (the streaming-unfriendly layout tradeoff is
irrelevant for blobs that live whole in a lake column). Reference parity:
the reference pipeline treats media as opaque blobs end-to-end; this
module exists for the §2.9 curation surface (frame sampling), not a
reference operator.
"""

from __future__ import annotations

import struct

_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def _box(fourcc: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I4sQ", 1, fourcc, len(payload) + 16) + payload
    return struct.pack(">I4s", len(payload) + 8, fourcc) + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def mux_mjpeg_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    frames_per_chunk: int = 0,
    large: bool = False,
) -> bytes:
    """Assemble JPEG frames into a valid MP4 (ISO BMFF) with one video
    track of ``jpeg`` samples at a fixed frame rate.

    ``frames_per_chunk=0`` packs all samples into one chunk (the common
    faststart-less layout); a positive value splits the mdat into chunk
    runs so ``stsc`` has real work to do. ``large=True`` writes a 64-bit
    ``largesize`` mdat and ``co64`` offsets — the >4 GiB layout, emitted
    at any size so the demux path for it stays tested.
    """
    n = len(frames)
    if n == 0:
        raise ValueError("mp4 needs at least one frame")
    timescale = 1_000_000
    delta = timescale // fps

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload, large=large)
    data_start = len(ftyp) + (16 if large else 8)

    fpc = frames_per_chunk if frames_per_chunk > 0 else n
    sizes = [len(f) for f in frames]
    chunk_offsets: list[int] = []
    pos = data_start
    for c0 in range(0, n, fpc):
        chunk_offsets.append(pos)
        pos += sum(sizes[c0 : c0 + fpc])

    dur = n * delta
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">4I", 0, 0, timescale, dur)
        + struct.pack(">ihh2I", 0x00010000, 0x0100, 0, 0, 0)
        + _UNITY_MATRIX + struct.pack(">6I", *([0] * 6))
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 3,  # enabled | in-movie
        struct.pack(">5I", 0, 0, 1, 0, dur)
        + struct.pack(">2I4h", 0, 0, 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">2I", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">4I", 0, 0, timescale, dur) + struct.pack(">Hh", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + struct.pack(">3I", 0, 0, 0) + b"MJPEG\x00",
    )
    # VisualSampleEntry 'jpeg' (86 bytes): the QT motion-JPEG description.
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">Hh3I", 0, 0, 0, 0, 0)
        + struct.pack(">2H", width, height)
        + struct.pack(">2I", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + bytes([5]) + b"MJPEG" + b"\x00" * 26
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">3I", 1, n, delta))
    if n % fpc == 0 or n <= fpc:
        stsc_entries = [(1, min(fpc, n), 1)]
    else:
        stsc_entries = [(1, fpc, 1), (len(chunk_offsets), n % fpc, 1)]
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">3I", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">2I", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    if large:
        stco = _full(
            b"co64", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes."""
    p = start
    while p + 8 <= end:
        size, fourcc = struct.unpack_from(">I4s", buf, p)
        hdr = 8
        if size == 1:
            if p + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", buf, p + 8)
            hdr = 16
        elif size == 0:
            size = end - p
        if size < hdr or p + size > end:
            raise ValueError("corrupt box size")
        yield fourcc, p + hdr, p + size
        p += size


def _child(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _walk(buf, start, end):
        if fc == fourcc:
            return s, e
    return None


def demux_mjpeg_mp4(data: bytes) -> tuple[int, list[bytes]]:
    """Parse an ISO BMFF file and return ``(uspf, sample blobs)`` for the
    first video track — the ``demux_mjpeg_avi`` contract.

    Raises ``ValueError`` on anything that isn't a well-formed MP4 with a
    complete sample table; callers (``sample_frames``) degrade those rows
    to the byte-slice stub, never abort the corpus pass.
    """
    b = bytes(data)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file")
    moov = _child(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("no moov box")

    for fc, ts, te in _walk(b, *moov):
        if fc != b"trak":
            continue
        mdia = _child(b, ts, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(b, *mdia, b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _child(b, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak missing mdhd")
        version = b[mdhd[0]]
        # v0: c/m/timescale/duration u32; v1: c/m u64, timescale u32
        timescale = struct.unpack_from(
            ">I", b, mdhd[0] + (20 if version == 1 else 12)
        )[0]
        minf = _child(b, *mdia, b"minf")
        stbl = _child(b, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("video trak missing stbl")

        tables: dict[bytes, tuple[int, int]] = {}
        for tfc, s, e in _walk(b, *stbl):
            tables[tfc] = (s, e)
        for need in (b"stts", b"stsz", b"stsc"):
            if need not in tables:
                raise ValueError(f"missing {need.decode()} table")
        if b"stco" not in tables and b"co64" not in tables:
            raise ValueError("missing chunk-offset table")

        s, _e = tables[b"stts"]
        (n_runs,) = struct.unpack_from(">I", b, s + 4)
        total_units = n_samples_stts = 0
        for i in range(n_runs):
            cnt, delta = struct.unpack_from(">2I", b, s + 8 + 8 * i)
            n_samples_stts += cnt
            total_units += cnt * delta

        s, _e = tables[b"stsz"]
        fixed, n_samples = struct.unpack_from(">2I", b, s + 4)
        if fixed:
            sizes = [fixed] * n_samples
        else:
            sizes = list(struct.unpack_from(f">{n_samples}I", b, s + 12))

        s, _e = tables[b"stsc"]
        (n_sc,) = struct.unpack_from(">I", b, s + 4)
        sc = [struct.unpack_from(">3I", b, s + 8 + 12 * i) for i in range(n_sc)]

        if b"stco" in tables:
            s, _e = tables[b"stco"]
            (n_ch,) = struct.unpack_from(">I", b, s + 4)
            offsets = list(struct.unpack_from(f">{n_ch}I", b, s + 8))
        else:
            s, _e = tables[b"co64"]
            (n_ch,) = struct.unpack_from(">I", b, s + 4)
            offsets = list(struct.unpack_from(f">{n_ch}Q", b, s + 8))

        frames: list[bytes] = []
        si = 0
        for ci, off in enumerate(offsets):
            # samples-per-chunk for chunk ci+1 = the last stsc run whose
            # first_chunk <= ci+1 (runs are sorted by first_chunk)
            spc = next(
                (run[1] for run in reversed(sc) if run[0] <= ci + 1), 0
            )
            pos = off
            for _ in range(spc):
                if si >= n_samples:
                    break
                if pos + sizes[si] > len(b):
                    raise ValueError("sample range past EOF")
                frames.append(b[pos : pos + sizes[si]])
                pos += sizes[si]
                si += 1
        if si != n_samples:
            raise ValueError("chunk map does not cover all samples")

        n_clock = n_samples_stts or n_samples
        uspf = round(total_units * 1_000_000 / (timescale * n_clock)) if n_clock else 100_000
        return (uspf or 100_000), frames

    raise ValueError("no video track")
