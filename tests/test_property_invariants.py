"""Property-based invariants (hypothesis) for the driver-side kernels.

The oracle sweep pins exact values on fixture data; these pin ALGEBRAIC
properties on arbitrary inputs — the class of bug a fixed fixture can
miss (an unusual image size, a pathological symbol, media bytes that
collide with wire-format delimiters). All Spark-free, so the whole file
runs in milliseconds per example.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from one_one_one_rule_spark.operators.multimodal import (
    decode_image,
    image_features,
)
from one_one_one_rule_spark.operators.similarity import (
    SAMPLE_HASH_P,
    sample_hash_py,
)
from one_one_one_rule_spark.sources.drive_client import (
    MULTIPART_BOUNDARY,
    multipart_related_body,
)

dims = st.integers(min_value=1, max_value=9)
pixel_arrays = st.tuples(dims, dims, st.integers(0, 2**31 - 1)).map(
    lambda t: np.random.default_rng(t[2])
    .integers(0, 256, size=(t[0], t[1], 3))
    .astype("uint8")
)


def _bmp_bytes(pixels):
    import struct

    h, w = pixels.shape[0], pixels.shape[1]
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for row in pixels[::-1]:
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])
        line += b"\x00" * (row_bytes - len(line))
        data += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    header += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(header + data)


def _ppm_bytes(pixels):
    h, w = pixels.shape[0], pixels.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


@settings(max_examples=60, deadline=None)
@given(pixel_arrays)
def test_bmp_roundtrip_exact(img):
    out = decode_image(_bmp_bytes(img))
    assert out is not None and np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(pixel_arrays)
def test_ppm_roundtrip_exact(img):
    out = decode_image(_ppm_bytes(img))
    assert out is not None and np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(pixel_arrays, st.integers(min_value=1, max_value=12))
def test_image_features_bounded_and_dim_exact(img, dim):
    feats = image_features(img, dim)
    assert len(feats) == dim
    assert all(0.0 <= v <= 1.0 for v in feats)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_arbitrary_bytes_never_false_positive_decode(payload):
    # strict validation: random blobs (and every text payload) must fall
    # through to the stub path, never half-decode
    if payload[:2] not in (b"BM", b"P6"):
        assert decode_image(payload) is None
    else:
        decode_image(payload)  # must not raise, whatever it returns


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=20))
def test_normalize_ticker_idempotent(sym):
    from one_one_one_rule_spark.sources.tickers import _normalize_ticker_str

    once = _normalize_ticker_str(sym)
    assert _normalize_ticker_str(once) == once


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_sample_hash_in_range_and_pure(v):
    h = sample_hash_py(v)
    assert 0 <= h < SAMPLE_HASH_P
    assert h == sample_hash_py(v)


media_bytes = st.binary(max_size=256).filter(
    lambda b: MULTIPART_BOUNDARY.encode() not in b
)


@settings(max_examples=60, deadline=None)
@given(media_bytes, st.text(st.characters(codec="ascii"), max_size=20))
def test_multipart_media_recoverable(media, name):
    body, ctype = multipart_related_body({"name": name}, media, "text/csv")
    # the media part sits verbatim between its header and the closing
    # boundary — the property the fake Drive's parser relies on
    marker = b"Content-Type: text/csv\r\n\r\n"
    start = body.index(marker) + len(marker)
    end = body.rindex(f"\r\n--{MULTIPART_BOUNDARY}--".encode())
    assert body[start:end] == media
    assert MULTIPART_BOUNDARY in ctype


# ---------------------------------------------------------------------------
# compaction planner (sources/layout.py:plan_compaction)
# ---------------------------------------------------------------------------

from one_one_one_rule_spark.sources.layout import plan_compaction  # noqa: E402

file_lists = st.lists(
    st.tuples(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=0, max_value=10_000),
    ),
    max_size=40,
    unique_by=lambda ps: ps[0],
)


@given(file_lists, st.integers(min_value=1, max_value=5_000))
@settings(max_examples=200)
def test_plan_compaction_partitions_input_exactly(files, target):
    bins = plan_compaction(files, target)
    flat = sorted(p for b in bins for p in b)
    assert flat == sorted(p for p, _ in files)


@given(file_lists, st.integers(min_value=1, max_value=5_000))
@settings(max_examples=200)
def test_plan_compaction_bins_respect_target(files, target):
    sizes = dict(files)
    for b in plan_compaction(files, target):
        total = sum(sizes[p] for p in b)
        if len(b) > 1:
            # multi-file bins never exceed the target
            assert total <= target
        else:
            # singletons are oversized files, or small files that simply
            # opened a new bin — both are <= target or >= target trivially
            assert total <= target or sizes[b[0]] >= target


@given(file_lists, st.integers(min_value=1, max_value=5_000))
@settings(max_examples=100)
def test_plan_compaction_is_deterministic(files, target):
    assert plan_compaction(files, target) == plan_compaction(files, target)


# --- sliding-window chunk arithmetic (docs_chunk_overlap's formula) ----

chunk_params = st.tuples(
    st.integers(min_value=1, max_value=500),   # n_tokens
    st.integers(min_value=1, max_value=64),    # window L
    st.integers(min_value=1, max_value=64),    # stride S (clamped <= L)
)


@settings(max_examples=300, deadline=None)
@given(chunk_params)
def test_chunk_window_formula_covers_exactly(params):
    """The closed-form chunk manifest (k_max = ceil((n-L)/S) via integer
    arithmetic, right-aligned tail) must cover every token, emit only
    full-length windows when the doc allows, and keep starts strictly
    increasing by at most one stride — for ARBITRARY (n, L, S<=L), not
    just the fixture's constants."""
    n, L, S = params
    S = min(S, L)
    k_max = 0 if n <= L else -(-(n - L) // S)  # ceil div, ints only
    starts = [min(k * S, max(n - L, 0)) for k in range(k_max + 1)]
    length = min(L, n)
    covered = set()
    for s in starts:
        covered.update(range(s, s + length))
    assert covered == set(range(n))            # exact coverage, no spill
    assert starts[0] == 0 and starts[-1] + length == n
    assert starts == sorted(set(starts))       # monotone, no duplicates
    for a, b in zip(starts, starts[1:]):
        assert 0 < b - a <= S                  # tail closer, never farther
