"""Hypothesis property tests for engine primitives that have pure
Python or DuckDB twins — no SparkSession needed, so hundreds of random
cases run in seconds. (Spark-side properties use fixed-seed loops in
their own modules; JVM startup makes per-example Spark runs
impractical under hypothesis deadlines.)"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simplemapreduceframework_spark.operators.bpe import (
    encode_word,
    merge_pair_in_word,
)
from simplemapreduceframework_spark.operators.multimodal import (
    decode_pixels,
    decode_wav,
    make_bmp,
    make_pgm,
    make_png,
    make_ppm,
    make_wav,
)

_CHARS = st.sampled_from("abcde")
_WORDS = st.text(alphabet="abcde", min_size=1, max_size=12)


def _merge_reference(syms: list[str], left: str, right: str) -> list[str]:
    """Independent spec: leftmost-first non-overlapping scan."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    st.lists(_CHARS, min_size=0, max_size=16),
    _CHARS,
    _CHARS,
)
def test_merge_pair_matches_spec(syms, left, right):
    assert merge_pair_in_word(list(syms), left, right) == _merge_reference(
        list(syms), left, right
    )


@given(
    _WORDS,
    st.lists(
        st.tuples(_CHARS, _CHARS), min_size=0, max_size=5
    ),
)
def test_encode_word_roundtrips(word, pairs):
    merges = [
        (rank, l, r, 0) for rank, (l, r) in enumerate(pairs, 1)
    ]
    toks = encode_word(word, merges)
    assert "".join(toks) == word  # lossless
    assert all(toks)  # no empty tokens
    assert len(toks) <= len(word)  # merging never grows the sequence


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


# The DuckDB list_reduce fold used by the bpe_encode_gate oracle: the
# tail-replacement left fold must equal the Python leftmost-first spec
# for EVERY word and merge pair, including l == r self-merges.
_FOLD_SQL = """
SELECT replace(list_reduce(regexp_split_to_array(?, ''),
    (a, x) -> CASE
        WHEN regexp_extract(a, '[^|]*$') = ? AND x = ?
        THEN regexp_replace(a, '[^|]*$', ? || ?)
        ELSE a || '|' || x END), '|', ' ')
"""


@settings(deadline=None, max_examples=300)
@given(_WORDS, _CHARS, _CHARS)
def test_duckdb_fold_equals_python_merge(duck, word, left, right):
    got = duck.execute(
        _FOLD_SQL, [word, left, right, left, right]
    ).fetchone()[0]
    want = " ".join(merge_pair_in_word(list(word), left, right))
    assert got == want, (word, left, right)


@settings(deadline=None, max_examples=60)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=10**6),
)
def test_image_codecs_roundtrip_exact_pixel_sums(w, h, fill):
    v = fill % 256
    assert decode_pixels(make_bmp(w, h, fill)) == ("bmp", w, h, 3, v * 3 * w * h)
    assert decode_pixels(make_ppm(w, h, fill)) == ("ppm", w, h, 3, v * 3 * w * h)
    assert decode_pixels(make_pgm(w, h, fill)) == ("pgm", w, h, 1, v * w * h)
    assert decode_pixels(make_png(w, h, fill)) == ("png", w, h, 3, v * 3 * w * h)


@settings(deadline=None, max_examples=60)
@given(
    st.integers(min_value=1, max_value=2000),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=10**6),
)
def test_wav_codec_roundtrip_exact_sample_sums(n, rate, ch, fill):
    v = fill % 1000
    got = decode_wav(make_wav(n, rate, ch, fill))
    assert got == (rate, ch, n, v * n * ch, v)


@settings(deadline=None, max_examples=200)
@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.data(),
    st.sampled_from([0, 1, 2, 3, 5]),
)
def test_jpeg_roundtrip_arbitrary_block_grids(bw, bh, data, ri):
    """Baseline JPEG encode->decode is exactly invertible for ANY
    block-constant raster (not just the query's checkerboard): random
    per-block values sweep every DC Huffman size category (diffs up to
    +-255), random restart intervals sweep the RSTn predictor-reset
    seams, and the decoded pixel sum must equal 64 * sum(values)."""
    from simplemapreduceframework_spark.operators.multimodal import (
        decode_pixels,
        make_jpeg,
    )

    blocks = [
        [data.draw(st.integers(0, 255)) for _ in range(bw)]
        for _ in range(bh)
    ]
    j = make_jpeg(8 * bw, 8 * bh, restart_interval=ri, blocks=blocks)
    want = 64 * sum(sum(row) for row in blocks)
    assert decode_pixels(j) == ("jpeg", 8 * bw, 8 * bh, 1, want)


@settings(deadline=None, max_examples=200)
@given(st.binary(min_size=0, max_size=2000), st.integers(2, 8))
def test_lzw_roundtrip_arbitrary_bytes(payload, mcs):
    """GIF-variant LZW encode->decode is the identity for arbitrary
    byte strings at every legal min code size (symbols clamped into
    the alphabet), including the empty string."""
    from simplemapreduceframework_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    clamped = bytes(v % (1 << mcs) for v in payload)
    assert _lzw_decode(_lzw_encode(clamped, mcs), mcs) == clamped
