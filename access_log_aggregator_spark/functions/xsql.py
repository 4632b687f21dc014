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


def lit_str(s: str, d: str) -> str:
    """A string as a safely-escaped SQL literal in the given dialect —
    Spark string literals are backslash-escaped, DuckDB's are
    quote-doubled. Interpolating raw user/data strings (salts, stratum
    values) without this breaks on the first apostrophe."""
    if d == SPARK:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return "'" + s.replace("'", "''") + "'"


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


# ---------------------------------------------------------------------------
# Sketches: HyperLogLog distinct counting + count-min frequency estimation.
#
# Both are the bounded-state approximate twins of the reference's exact
# counters (internal/accesslog/summaries.go:3-27 keeps one exact counter
# per host in a Go map — unbounded state): at 10^12 rows an exact
# count-distinct shuffles every key, while an HLL keeps HLL_M registers
# per group and a count-min sketch keeps CMS_D * CMS_W cells TOTAL, both
# mergeable with max / + (partial aggregation stays map-side). The
# formulas below are integer-exact cross-engine (same determinism rules
# as the hash family above): the only doubles are the final estimate
# arithmetic, which is a fixed-length IEEE expression over exact ints.
# ---------------------------------------------------------------------------

#: HLL register count (2^HLL_REG_BITS) — std error ~ 1.04/sqrt(M) = 9.2%
HLL_M = 128
HLL_REG_BITS = 7
#: bit width of the rho domain — an EXACT power of two (see hll_rho)
HLL_RHO_BITS = 22
#: xorshift-multiply rounds of the avalanche mix (see hll_mix); every
#: product stays < 2^62 (operand < 2^30, multiplier < 2^32), so DuckDB
#: (which raises on int64 overflow) and Spark (which wraps) never diverge
HLL_MIX_MULTS = [2654435761, 1327217885, 3266489917]

#: count-min rows (independent affine hashes over polyhash) and width
CMS_COEFFS = [(23, 17), (29, 257), (37, 8191), (41, 65537)]
CMS_D = len(CMS_COEFFS)
CMS_W = 512


def _xor(a: str, b: str, d: str) -> str:
    return f"({a} ^ {b})" if d == SPARK else f"xor({a}, {b})"


def _shr(a: str, k: int, d: str) -> str:
    return f"shiftright({a}, {k})" if d == SPARK else f"({a} >> {k})"


def hll_mix(hash_expr: str, d: str) -> str:
    """Avalanche mix of a polyhash value — 3 xorshift-multiply rounds.

    Polyhash alone is NOT an HLL-grade hash: short keys never wrap mod P,
    so their magnitudes (hence leading-zero counts) are structured —
    measured 45% cardinality error on 4-char sequential keys. One affine
    re-hash keeps lattice structure (measured up to 48% error); three
    xorshift-multiply rounds bring the worst case over 50 prefix/size
    test sets to 15.6% (~1.7 sigma of the m=128 ideal).

    Each round is a ``transform`` lambda over a singleton array so the
    previous round binds to a lambda VARIABLE: ``v ^ (v >> 15)`` names v
    twice, and writing the rounds as plain nested expressions doubles the
    whole subtree per round — Catalyst's CollapseProject inlined such a
    chain into a 2^rounds-fold duplication of the per-char polyhash fold
    (observed in the physical plan; higher-order functions evaluate
    interpreted, outside codegen subexpression elimination)."""
    arr = hll_mix_arr(hash_expr, d)
    return f"element_at({arr}, 1)" if d == SPARK else f"({arr})[1]"


def hll_mix_arr(hash_expr: str, d: str) -> str:
    """:func:`hll_mix` as its singleton-array form, for callers that want
    to derive several columns from one mix evaluation (bind the element
    with one more ``transform`` lambda, or explode it through a generator
    like ``inline`` — both evaluate this chain exactly once per row)."""
    if d == SPARK:
        arr, tf = f"array({hash_expr})", "transform"
    else:
        arr, tf = f"[{hash_expr}]", "list_transform"
    for mult in HLL_MIX_MULTS:
        arr = f"{tf}({arr}, v -> ({_xor('v', _shr('v', 15, d), d)}) * {mult} % {P})"
    return f"{tf}({arr}, v -> {_xor('v', _shr('v', 16, d), d)})"


def hll_reg(mixed_expr: str, d: str) -> str:
    """Register index of a mixed hash (low HLL_REG_BITS bits)."""
    return f"(({mixed_expr}) % {HLL_M})"


def hll_rho(mixed_expr: str, d: str) -> str:
    """Position of the first 1-bit (from the MSB of the HLL_RHO_BITS-bit
    rho word) + 1 — the quantity HLL registers maximize.

    The rho word is an independent affine transform of the mixed hash
    modded into an EXACT power-of-two domain: taking high bits of a
    mod-P value instead (P/M = 7,812,500 < 2^23) left a truncated-domain
    bias that overestimated every large cardinality by 5-24% (measured).
    Modding the ~2^30 mixed domain by 2^22 is uniform to 1 part in 238.

    ``bin()`` is minimal-width with bin(0) = '0' in BOTH engines
    (verified by experiment), so rho = HLL_RHO_BITS - bit_length(w) + 1,
    with the all-zero word pinned to HLL_RHO_BITS + 1 explicitly. The
    CASE names the rho word twice, so it is bound to a lambda variable
    like the mix rounds (the flat form re-evaluated the whole upstream
    mix+polyhash chain per mention)."""
    w = f"(((48271 * ({mixed_expr}) + 11) % {P}) % {1 << HLL_RHO_BITS})"
    body = (f"case when w = 0 then {HLL_RHO_BITS + 1} "
            f"else {HLL_RHO_BITS + 1} - length(bin(w)) end")
    if d == SPARK:
        return f"element_at(transform(array({w}), w -> {body}), 1)"
    return f"(list_transform([{w}], w -> {body}))[1]"


def hll_estimate(sum_expr: str, nreg_expr: str, d: str) -> str:
    """HLL estimate from the per-group scaled harmonic sum and the number
    of PRESENT registers (both exact bigints):

    - ``sum_expr``  = sum over present registers of 2^(RHO_BITS+1 - M_r)
      (absent registers, M = 0, are added here as 2^(RHO_BITS+1) each);
    - raw = alpha_M * M^2 * 2^(RHO_BITS+1) / S  (one IEEE div of ints);
    - small-range (Flajolet et al. 2007): raw <= 2.5 M and empty
      registers exist -> linear counting M * ln(M / V).

    The 32-bit-hash large-range correction is omitted: the hash domain
    here is ~2^30 (polyhash mod P), documented in SCALE.md — estimates
    are for operational counters, not for cardinalities near 2^30.

    alpha is computed in PYTHON and emitted as a string-to-double cast:
    a literal like ``0.7213`` parses as DECIMAL in both engines, whose
    scale/rounding rules then differ (a real corpus estimate diverged at
    1.2e-8 relative through decimal division); ``cast('…17 digits…' as
    double)`` is a correctly-rounded parse in both. ``2.5 * M`` folds to
    the exact integer 320 for the same reason. The linear-counting value
    M * ln(M/V) is a LOOKUP over the 128 possible V values (1..M;
    V = M is the empty-sketch arm, value exactly 0), each
    precomputed in Python and emitted the same way: SQL ``ln`` diverged
    by one ulp between Java's and C's libm on a real corpus input."""
    import math

    m = HLL_M
    two_w = 1 << (HLL_RHO_BITS + 1)
    alpha = f"cast('{0.7213 / (1.0 + 1.079 / m):.17g}' as double)"
    lin_thresh = 5 * m // 2  # 2.5 * M, exact for the even M used here
    s_all = f"(({sum_expr}) + ({m} - ({nreg_expr})) * cast({two_w} as bigint))"
    raw = f"({alpha} * {m} * {m} * cast({two_w} as double) / {s_all})"
    v = f"({m} - ({nreg_expr}))"
    # V ranges 1..M: V = M is the empty-sketch case (no register present),
    # where linear counting gives exactly M * ln(M/M) = 0
    lin_vals = ", ".join(f"cast('{m * math.log(m / vv):.17g}' as double)"
                         for vv in range(1, m + 1))
    if d == SPARK:
        lin = f"element_at(array({lin_vals}), cast({v} as int))"
    else:
        lin = f"([{lin_vals}])[{v}]"
    return (f"(case when {raw} <= {lin_thresh} and {v} > 0 "
            f"then {lin} else {raw} end)")


def hll_pow2_term(max_rho_expr: str, d: str) -> str:
    """The exact scaled harmonic-sum term 2^(RHO_BITS+1 - M_r) of one
    present register (bigint shift — exact in both engines)."""
    if d == SPARK:
        return f"shiftleft(cast(1 as bigint), {HLL_RHO_BITS + 1} - ({max_rho_expr}))"
    return f"(1::BIGINT << ({HLL_RHO_BITS + 1} - ({max_rho_expr})))"


