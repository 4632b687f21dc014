"""Cross-engine SQL snippet builders (Spark SQL + DuckDB dialects).

The correctness gate runs every query on Spark AND on DuckDB and compares
value hashes, so hash/dedup/similarity operators need *bit-identical*
results from both engines. These helpers emit the SAME formula in each
dialect; determinism rules proven by experiment in this sandbox:

- integer folds (polynomial hash, minhash, simhash) are exact in both;
- double folds are bit-identical when both engines (a) cast every element
  to double BEFORE multiplying and (b) reduce sequentially in index order;
- decimal sums are order-independent => cast the final decimal to double
  for a stable cross-engine column type.

DuckDB quirks handled here: ``list_reduce`` has no init value and errors on
empty lists (guards added on BOTH sides so the formulas stay identical),
and lambdas/array functions use different names (list_transform vs
transform, etc.).
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

#: modulus for all integer hashes (< 2^30 so a*h stays well inside int64)
P = 1_000_000_007

#: minhash coefficient pairs (a_k, b_k) — 8 hash functions
MINHASH_COEFFS = [
    (2, 1), (3, 7), (5, 31), (7, 127),
    (11, 709), (13, 5381), (17, 52711), (19, 648391),
]

SIMHASH_BITS = 64


def transform(arr: str, var: str, body: str, d: str) -> str:
    f = "transform" if d == SPARK else "list_transform"
    return f"{f}({arr}, {var} -> {body})"


def arr_sum(arr: str, d: str) -> str:
    """Exact integer sum of an array, 0 for empty (identical both sides)."""
    if d == SPARK:
        inner = f"aggregate({arr}, 0L, (acc, x) -> acc + x)"
    else:
        inner = f"list_reduce({arr}, (acc, x) -> acc + x)"
    return f"(case when size({arr}) > 0 then {inner} else 0 end)" if d == SPARK else \
           f"(case when length({arr}) > 0 then {inner} else 0 end)"


def arr_fold_double(arr: str, d: str) -> str:
    """Sequential (index-order) double fold — bit-identical across engines."""
    if d == SPARK:
        inner = f"aggregate({arr}, 0D, (acc, x) -> acc + x)"
        return f"(case when size({arr}) > 0 then {inner} else 0D end)"
    # seed the fold with +0.0 like Spark's aggregate(…, 0D, …): list_reduce
    # seeds with the FIRST ELEMENT, so a fold ending at -0.0 (e.g. [-0.0])
    # would keep the sign bit DuckDB-side while Spark's 0.0 + -0.0 = +0.0 —
    # a bitwise hash divergence on an otherwise equal value
    inner = f"list_reduce(list_prepend(0.0::DOUBLE, {arr}), (acc, x) -> acc + x)"
    return f"(case when length({arr}) > 0 then {inner} else 0.0::DOUBLE end)"


def arr_min(arr: str, d: str) -> str:
    return f"array_min({arr})" if d == SPARK else f"list_aggregate({arr}, 'min')"


def arr_distinct(arr: str, d: str) -> str:
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def arr_size(arr: str, d: str) -> str:
    return f"size({arr})" if d == SPARK else f"length({arr})"


def tokens(expr: str, d: str) -> str:
    """Whitespace tokenization (parity verified).

    The whitespace class is EXPLICIT ([ \\t\\n\\f\\r]) because Java's \\s
    includes vertical tab \\x0B while RE2's does not — with bare \\s the two
    engines would tokenize \\x0B-bearing text differently. \\x0B is a token
    character in both engines under this class (consistently)."""
    if d == SPARK:
        return f"split(trim({expr}), '[ \\\\t\\\\n\\\\f\\\\r]+')"
    return f"regexp_split_to_array(trim({expr}), '[ \\t\\n\\f\\r]+')"


def char_codes(expr: str, d: str) -> str:
    if d == SPARK:
        return f"transform(split({expr}, ''), c -> ascii(c))"
    return f"list_transform(split({expr}, ''), c -> ascii(c)::BIGINT)"


#: GPT-2-style "BPE-ish" pre-tokenizer regex, restricted to the subset where
#: Java regex (Spark) and RE2 (DuckDB) agree: no lookahead, Unicode \p{L}/
#: \p{N} classes, and an EXPLICIT whitespace class (Java \s includes \x0B,
#: RE2's does not — bare \s would break cross-engine count parity on
#: \x0B-bearing text). Contraction suffixes | space-prefixed letter runs
#: | digit runs | punctuation runs | whitespace runs.
_WS = r" \t\n\f\r"
BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
               r"| ?[^" + _WS + r"\p{L}\p{N}]+|[" + _WS + r"]+")


def bpe_token_count(expr: str, d: str) -> str:
    """Number of BPE-ish pre-tokens of a string (parity verified)."""
    if d == SPARK:
        pat = BPE_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
        return f"size(regexp_extract_all({expr}, '{pat}', 0))"
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def polyhash(expr: str, d: str) -> str:
    """Polynomial rolling hash over UTF code points: fold (acc*31+c) % P.

    The shared hash primitive backing fingerprints, minhash and simhash —
    exact integer arithmetic, identical in both engines (verified).
    """
    codes = char_codes(expr, d)
    if d == SPARK:
        inner = f"aggregate({codes}, 0L, (acc, c) -> (acc * 31 + c) % {P})"
    else:
        inner = f"list_reduce({codes}, (acc, c) -> (acc * 31 + c) % {P})"
    return f"(case when length({expr}) > 0 then {inner} else 0 end)"


def char_shingles(expr: str, n: int, d: str) -> str:
    """All overlapping n-character shingles of a string (parity verified)."""
    if d == SPARK:
        seq = f"sequence(1, length({expr}) - {n - 1})"
        body = f"transform({seq}, i -> substring({expr}, i, {n}))"
        return f"(case when length({expr}) >= {n} then {body} else array() end)"
    seq = f"generate_series(1, length({expr}) - {n - 1})"
    body = f"list_transform({seq}, i -> substring({expr}, i, {n}))"
    return f"(case when length({expr}) >= {n} then {body} else [] end)"


def word_ngrams(tok_arr: str, n: int, d: str) -> str:
    """Word n-gram shingles (space-joined) from a token array column."""
    if d == SPARK:
        seq = f"sequence(1, size({tok_arr}) - {n - 1})"
        gram = " || ' ' || ".join(f"element_at({tok_arr}, i + {k})" for k in range(n))
        body = f"transform({seq}, i -> {gram})"
        return f"(case when size({tok_arr}) >= {n} then {body} else array() end)"
    seq = f"generate_series(1, length({tok_arr}) - {n - 1})"
    gram = " || ' ' || ".join(f"{tok_arr}[i + {k}]" for k in range(n))
    body = f"list_transform({seq}, i -> {gram})"
    return f"(case when length({tok_arr}) >= {n} then {body} else [] end)"


def minhash_exprs(hash_arr: str, d: str) -> list[str]:
    """K minhash values over a precomputed array of shingle hashes."""
    out = []
    for a, b in MINHASH_COEFFS:
        mapped = transform(hash_arr, "h", f"({a} * h + {b}) % {P}", d)
        out.append(arr_min(mapped, d))
    return out


def minhash_fast_spark(text_col: str) -> tuple[str, str, str]:
    """Spark-only faster equivalent of the canonical minhash pipeline
    (:func:`char_shingles` -> :func:`polyhash` over distinct shingles ->
    :func:`minhash_exprs`). Values are identical:

    - the 5-char shingle hash is the weighted char-code sum mod P, which is
      congruent to the stepwise ``(acc*31+c) % P`` fold (intermediates stay
      below 2^63);
    - ``distinct`` is dropped — duplicates never change a minimum;
    - all K affine minima ride one aggregate pass in a struct accumulator
      instead of K transform+array_min passes.

    Returns (codes_expr, hs_expr(_codes), agg_expr(_hs)); the caller selects
    ``case when size(_hs) > 0 then _mh.m{{i}} end`` to reproduce the
    canonical NULL for shingle-less strings. DuckDB keeps the canonical
    formulation; cross-engine equality is enforced by the oracle checks.
    """
    n = 5
    codes = f"transform(split({text_col}, ''), c -> cast(ascii(c) as bigint))"
    term = " + ".join(
        f"element_at(_codes, i + {k}) * {31 ** (n - 1 - k)}" for k in range(n)
    )
    hs = (
        f"(case when length({text_col}) >= {n} then "
        f"transform(sequence(1, length({text_col}) - {n - 1}), i -> ({term}) % {P}) "
        f"else array() end)"
    )
    init = ", ".join(f"'m{i}', cast({P} as bigint)" for i in range(len(MINHASH_COEFFS)))
    upd = ", ".join(
        f"'m{i}', least(acc.m{i}, ({a} * h + {b}) % {P})"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    agg = f"aggregate(_hs, named_struct({init}), (acc, h) -> named_struct({upd}))"
    return codes, hs, agg


def minhash_sig_sql(table: str, id_col: str, text_col: str, d: str) -> str:
    """Dialect-appropriate ``select {id}, mh0..mhK from {table}`` body:
    the fast single-pass plan on Spark, the canonical formulation on DuckDB
    (same values — see :func:`minhash_fast_spark`)."""
    k = len(MINHASH_COEFFS)
    if d == SPARK:
        codes, hs, agg = minhash_fast_spark(text_col)
        cols = ", ".join(
            f"case when size(_hs) > 0 then _mh.m{i} end as mh{i}" for i in range(k)
        )
        return (
            f"with c as (select {id_col}, {text_col}, {codes} as _codes from {table}), "
            f"h as (select {id_col}, {hs} as _hs from c), "
            f"m as (select {id_col}, _hs, {agg} as _mh from h) "
            f"select {id_col}, {cols} from m"
        )
    sh = char_shingles(text_col, 5, d)
    hs = transform(arr_distinct(sh, d), "s", polyhash("s", d), d)
    cols = ", ".join(f"{e} as mh{i}" for i, e in enumerate(minhash_exprs("hs", d)))
    return (
        f"with t as (select {id_col}, {hs} as hs from {table}) "
        f"select {id_col}, {cols} from t"
    )


#: per-lane universal-hash constants for the 64 simhash bit lanes:
#: lane j's 1-bit hash of a token hash h is ``((h*A_j + B_j) mod P) mod 2``
#: (a classic universal 1-bit family; all intermediates < 2^60, so the
#: arithmetic is exact int64 in both engines — DuckDB errors on overflow,
#: so wraparound-style avalanche mixing is not an option).
SIMHASH_A = [((j + 1) * 2654435761) % P for j in range(SIMHASH_BITS)]
SIMHASH_B = [(j * 40503 + 17) % P for j in range(SIMHASH_BITS)]


def _lane_bit(h: str, j: int) -> str:
    return f"((({h} * {SIMHASH_A[j]} + {SIMHASH_B[j]}) % {P}) % 2)"


def simhash_expr(hash_arr: str, d: str) -> str:
    """SIMHASH_BITS-bit (int64) simhash of an array of token hashes.

    Lane j is set iff sum over tokens of (+1 if the lane's 1-bit hash of the
    token is 1, else -1) > 0. Pure int arithmetic — exact and identical in
    both engines. Bit 63 is the int64 sign bit: its weight is the min-long
    value, added LAST so every partial sum stays in range (the positive
    weights total 2^63-1).

    Implementation note: Spark runs ONE aggregate pass with a 64-lane count
    accumulator (zip_with against inline constant arrays) instead of 64
    separate transform+sum passes; the DuckDB dialect keeps the canonical
    per-lane formulation. Values are identical by construction (same counts,
    same sign rule, same bit weights).
    """
    nb = SIMHASH_BITS
    if d == SPARK:
        arr_a = "array(" + ", ".join(str(a) + "L" for a in SIMHASH_A) + ")"
        arr_b = "array(" + ", ".join(str(b) + "L" for b in SIMHASH_B) + ")"
        counts = (
            f"aggregate({hash_arr}, transform(sequence(0, {nb - 1}), j -> 0L), "
            f"(acc, h) -> zip_with(acc, sequence(0, {nb - 1}), "
            f"(a, j) -> a + (case when ((h * element_at({arr_a}, j + 1) "
            f"+ element_at({arr_b}, j + 1)) % {P}) % 2 = 1 then 1 else -1 end)))"
        )
        bits = (
            f"zip_with({counts}, sequence(0, {nb - 1}), "
            f"(c, j) -> case when c > 0 then shiftleft(1L, j) else 0L end)"
        )
        return f"aggregate({bits}, 0L, (acc, b) -> acc + b)"
    terms = []
    for j in range(nb):
        signed = transform(
            hash_arr, "h", f"(case when {_lane_bit('h', j)} = 1 then 1 else -1 end)", d
        )
        bitval = str(1 << j) if j < 63 else "(-9223372036854775807 - 1)"
        terms.append(f"(case when {arr_sum(signed, d)} > 0 then {bitval} else 0 end)")
    return "(" + " + ".join(terms) + ")"


def dot_double(vec_a: str, vec_b: str, dim: int, d: str) -> str:
    """Bit-identical dot product: per-element double cast + sequential fold."""
    if d == SPARK:
        prods = (
            f"zip_with(cast({vec_a} as array<double>), "
            f"cast({vec_b} as array<double>), (x, y) -> x * y)"
        )
        return f"aggregate({prods}, 0D, (acc, v) -> acc + v)"
    prods = (
        f"list_transform(generate_series(1, {dim}), "
        f"i -> {vec_a}[i]::DOUBLE * {vec_b}[i]::DOUBLE)"
    )
    # +0.0 seed: see arr_fold_double (-0.0 sign-bit parity with Spark)
    return f"list_reduce(list_prepend(0.0::DOUBLE, {prods}), (acc, v) -> acc + v)"


def norm_double(vec: str, dim: int, d: str) -> str:
    return f"sqrt({dot_double(vec, vec, dim, d)})"


def cosine_double(vec_a: str, vec_b: str, dim: int, d: str) -> str:
    return (
        f"({dot_double(vec_a, vec_b, dim, d)} / "
        f"({norm_double(vec_a, dim, d)} * {norm_double(vec_b, dim, d)}))"
    )


def lsh_plane_consts(j: int) -> tuple[int, int]:
    """Deterministic hyperplane-j weight generator constants: plane j's
    weight at coordinate i is ``((i*a_j + b_j) % 101) - 50``. a_j is forced
    nonzero so no plane degenerates to a constant, and (a_j, b_j) vary per
    plane so the family supports ~100 decorrelated planes (the old
    ``(i*(j+3)+11) % 17`` family silently repeated with period 17 in j and
    had a constant plane at j=14)."""
    a = (j * 47 + 13) % 101
    return (a if a else 1, (j * 29 + 11) % 101)


def lsh_plane_dot(vec: str, dim: int, j: int, d: str) -> str:
    """<vec, plane_j> with the bit-identical per-element double cast +
    sequential index-order fold of :func:`dot_double`."""
    a, b = lsh_plane_consts(j)
    w = f"(((i * {a} + {b}) % 101) - 50)"
    if d == SPARK:
        prods = (f"transform(sequence(1, {dim}), i -> "
                 f"element_at(cast({vec} as array<double>), i) * {w})")
        return f"aggregate({prods}, 0D, (acc, v) -> acc + v)"
    prods = f"list_transform(generate_series(1, {dim}), i -> {vec}[i]::DOUBLE * {w})"
    return f"list_reduce({prods}, (acc, v) -> acc + v)"


def lsh_bucket(vec: str, dim: int, n_planes: int, d: str,
               plane_offset: int = 0) -> str:
    """Sign-random-projection LSH bucket id over ``n_planes`` deterministic
    hyperplanes starting at global plane index ``plane_offset`` (bands of a
    multi-band scheme use disjoint plane ranges). Spark and DuckDB assign
    identical buckets bit-for-bit."""
    terms = []
    for k in range(n_planes):
        dot = lsh_plane_dot(vec, dim, plane_offset + k, d)
        terms.append(f"(case when {dot} > 0 then {1 << k} else 0 end)")
    return "(" + " + ".join(terms) + ")"


def dec_sum_double(expr: str, d: str) -> str:
    """Order-independent sum of a double column: exact decimal accumulate,
    then one cast to double (identical across engines and partitionings).

    Scale 4 keeps the scaled integer total < 2^53 at every tested SF, so
    DuckDB's int128-decimal -> double cast (double(S)/10^scale, two steps)
    is exact-then-correctly-rounded and matches Spark's BigDecimal cast
    bit-for-bit. (Scale 12 diverges: S overflows 2^53 and DuckDB
    double-rounds — found by experiment.)"""
    if d == SPARK:
        return f"cast(sum(cast({expr} as decimal(18,4))) as double)"
    return f"(sum(({expr})::decimal(18,4)))::double"
