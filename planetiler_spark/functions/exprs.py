"""Shared SQL expression fragments — single source of truth for Spark AND DuckDB.

The driver's correctness gate runs each Spark query next to an ANSI-SQL oracle
in DuckDB and compares value hashes, so every derivation here is written once
as SQL text and used verbatim by both engines (Spark via F.expr / spark.sql).

Cross-engine exactness rules (why results hash-match bit-for-bit):
  - geo anchors derive from integer keys via a Lehmer LCG (x*48271 mod 2^31-1):
    pure int64 arithmetic, exact in both engines; the final world coordinate is
    ONE correctly-rounded IEEE754 division, identical everywhere.
  - tile math (TileCoord.java:77-90 semantics) is floor() of one multiply of
    that coordinate — again correctly rounded, identical.
  - money/metric aggregations convert doubles to scaled BIGINTs *per row*
    (round(x*10000)) and sum integers, sidestepping order-dependent FP addition;
    final doubles are produced by ONE exact-integer division.
  - embedding similarity quantizes floats to round(x*1e6) ints per element and
    does integer dot products; cosine = one double division + sqrt (IEEE-exact).

Tile id layout matches the reference: TMS position + per-zoom start offset
(ZOOM_START_INDEX[z] = (4^z-1)/3, TileCoord.java:31-44,:86-90,:172-175).
"""

from __future__ import annotations

M31 = 2147483647  # Lehmer modulus 2^31-1
LCG_A = 48271


def lcg(expr: str, steps: int = 1) -> str:
    """steps applications of x -> (x*48271) mod (2^31-1), starting from expr mod m."""
    out = f"(({expr}) % {M31})"
    for _ in range(steps):
        out = f"(({out} * {LCG_A}) % {M31})"
    return out


def world_x(key: str) -> str:
    """Uniform worldX in [0,1) derived from an integer key (2 LCG steps)."""
    return f"({lcg(key, 2)} / {M31}.0)"


def world_y(key: str) -> str:
    """Uniform worldY in [0,1) derived from an integer key (3 LCG steps)."""
    return f"({lcg(key, 3)} / {M31}.0)"


def zoom_start_index(z: int) -> int:
    """ZOOM_START_INDEX[z] = sum_{i<z} 4^i (TileCoord.java:31-44)."""
    return (4**z - 1) // 3


def tile_x(wx: str, z) -> str:
    if isinstance(z, int):
        return f"CAST(floor(({wx}) * {1 << z}) AS BIGINT)"
    return f"CAST(floor(({wx}) * power(2.0, {z})) AS BIGINT)"


def tile_y(wy: str, z) -> str:
    return tile_x(wy, z)


def tile_id(tx: str, ty: str, z) -> str:
    """TMS-ordered global tile id (TileCoord.encode:86-90, tmsXYToPosition:172-175)."""
    if isinstance(z, int):
        return f"({zoom_start_index(z)} + ({tx}) * {1 << z} + ({1 << z} - 1 - ({ty})))"
    # variable zoom column: (4^z-1)/3 + tx*2^z + (2^z-1-ty). The /3 divides an
    # exactly-representable double by 3 with an integer true quotient -> exact.
    p2 = f"CAST(power(2.0, {z}) AS BIGINT)"
    p4 = f"(power(4.0, {z}) - 1)"
    return f"CAST(round({p4} / 3 + ({tx}) * {p2} + ({p2} - 1 - ({ty}))) AS BIGINT)"


def tile_id_from_key(key: str, z) -> str:
    """Full pipeline: integer key -> world coords -> containing tile id at z."""
    return tile_id(tile_x(world_x(key), z), tile_y(world_y(key), z), z)


def money_cents(expr: str, scale: int = 10000) -> str:
    """Per-row double -> exact scaled BIGINT (kills FP sum order-dependence)."""
    return f"CAST(round(({expr}) * {scale}) AS BIGINT)"


def sort_key_encode(tile: str, layer: str, sort_key: str, has_group: str) -> str:
    """64-bit feature key [tile:33][layer:8][sortKey:22][hasGroup:1]
    (FeatureGroup.encodeKey:176-180) in portable arithmetic (no shift operators)."""
    sk_bias = 1 << 21  # -SORT_KEY_MIN
    return (f"(({tile}) * {1 << 31} + (({layer}) % 256) * {1 << 23}"
            f" + ((({sort_key}) + {sk_bias}) % {1 << 22}) * 2 + ({has_group}))")


# Extraction note: keys reach ~2^60, beyond double's 2^53 exact range, so we
# never divide the raw key as a double. (key - key % d) / d with round() is
# exact: the quotient is a true integer << 2^53 and the dividend's double
# rounding error (<= 64 ulps of 2^60) perturbs the quotient by < 1e-7.
def sort_key_extract_tile(key: str) -> str:
    d = 1 << 31
    return f"CAST(round((({key}) - (({key}) % {d})) / {d}.0) AS BIGINT)"


def sort_key_extract_layer(key: str) -> str:
    lo, d = 1 << 31, 1 << 23
    return f"CAST(round(((({key}) % {lo}) - (({key}) % {d})) / {d}.0) AS BIGINT)"


def sort_key_extract_sortkey(key: str) -> str:
    d = 1 << 23
    return f"(CAST(round(((({key}) % {d}) - (({key}) % 2)) / 2.0) AS BIGINT) - {1 << 21})"


def label_grid_cell(w: str, grid: str = "0.25") -> str:
    """Label-grid square index of a scaled coordinate (GeoUtils.labelGridId:422-427;
    wrap omitted because inputs here are already in [0, 2^z))."""
    return f"CAST(floor(({w}) / {grid}) AS BIGINT)"


# ---------------------------------------------------------------------------
# perceptual-hash stand-in (images input_hint: phash:int64) — portable bit ops
# ---------------------------------------------------------------------------

def phash62(key: str) -> str:
    """Non-negative 62-bit perceptual-hash stand-in: two independent Lehmer
    streams packed hi*2^31 + lo. Stays < 2^62, so every band extraction below
    is exact non-negative integer division in both engines."""
    hi = lcg(key, 4)
    lo = lcg(key, 5)
    return f"({hi} * 2147483648 + {lo})"


def flip_bits(expr: str, mask: int) -> str:
    """XOR a compile-time constant mask into a non-negative BIGINT without a
    bitwise operator (Spark spells xor `^`, DuckDB spells it `xor()` — and
    DuckDB's `^` is power). Distinct-bit flips are independent, and bit b's
    contribution to x is (x % 2^(b+1)) - (x % 2^b) ∈ {0, 2^b}, so
    x xor mask == x + sum_b [2^b - 2*((x % 2^(b+1)) - (x % 2^b))] over the set
    bits of mask — pure integer add/mod, exact in both engines."""
    out = f"({expr})"
    terms = []
    b = 0
    while mask >> b:
        if (mask >> b) & 1:
            p = 1 << b
            terms.append(
                f"({p} - 2 * ((({expr}) % {2 * p}) - (({expr}) % {p})))")
        b += 1
    if not terms:
        return out
    return f"({out} + {' + '.join(terms)})"


def hash_band(expr: str, band: int, width_bits: int = 16) -> str:
    """band-th `width_bits`-bit slice of a non-negative (< 2^62) BIGINT hash —
    the LSH band key. ((x % hi) - (x % lo)) is band_val * lo exactly, and
    band_val has <= width_bits significant bits, so the one float division by
    a power of two is exact (same argument as the sort-key extraction note)."""
    lo = 1 << (band * width_bits)
    hi = lo << width_bits
    if band == 0:
        return f"((({expr})) % {hi})"
    top = f"({expr})" if hi > (1 << 62) else f"(({expr}) % {hi})"
    return (f"CAST(round(({top} - (({expr}) % {lo})) / {lo}.0) AS BIGINT)")


def hamming62(a: str, b: str, dialect: str) -> str:
    """popcount(a xor b) for non-negative BIGINTs. The one fragment that needs
    a per-engine spelling: Spark's bitwise xor is the `^` operator, DuckDB's is
    the xor() function (its `^` is exponentiation). bit_count() exists in both."""
    if dialect == "duckdb":
        return f"bit_count(xor(CAST({a} AS BIGINT), CAST({b} AS BIGINT)))"
    return f"bit_count(CAST({a} AS BIGINT) ^ CAST({b} AS BIGINT))"
