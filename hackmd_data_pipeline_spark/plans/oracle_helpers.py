"""DuckDB-SQL generators for Spark expressions with no DuckDB twin.

The driver's correctness gate runs each registered query's oracle SQL
in DuckDB and hash-compares the values against the Spark result
(__spark_entry__.py contract). Most oracles are plain ANSI SQL, but a
few Spark primitives have no DuckDB builtin — most importantly
``xxhash64``, which underpins the deterministic hash-bucket split
(operators/sampling.py). Rather than downgrade those queries to
rows-only checks, this module restates the primitive in
DuckDB-expressible 64-bit arithmetic so the full value-hash gate
applies (VERDICT r03 "Next round" item 1).

xxHash64 (public spec, github.com/Cyan4973/xxHash; the same closed
form Spark implements in
sql/catalyst/.../expressions/XXH64.java) for a single LONG column
chained with an INT literal seed — exactly what
``F.xxhash64(col, F.lit(seed))`` computes:

    h  = hashLong(col, 42)        # 42 = Spark's XxHash64 default seed
    h' = hashInt(seed_lit, h)     # the lit is IntegerType -> 4-byte path

Each step is {mul,add} mod 2**64, rotate-left, xor, and logical
right-shift. DuckDB's UBIGINT gives exact xor/>>/|; products are
computed in HUGEINT (signed INT128) via 32-bit split multiplication so
they can't overflow. Verified bit-exact against Spark's xxhash64 for
the full doc_id domain in tests/test_oracle_helpers.py.
"""

from __future__ import annotations

_M = "18446744073709551616"  # 2**64
_P1 = "11400714785074694791"
_P2 = "14029467366897019727"
_P3 = "1609587929392839161"
_P4 = "9650029242287828579"
_P5 = 2870177450012600261


def _mulmod(a: str, b: str | int) -> str:
    """(a*b) mod 2**64 without overflowing INT128: split a into 32-bit
    halves so each partial product is <= 2**96."""
    ah = f"(CAST({a} AS HUGEINT) // 4294967296)"
    al = f"(CAST({a} AS HUGEINT) % 4294967296)"
    return (f"CAST((({al} * {b}) % {_M} + "
            f"(({ah} * {b}) % 4294967296) * 4294967296) % {_M} AS UBIGINT)")


def _addmod(a: str, b: str | int) -> str:
    return f"CAST((CAST({a} AS HUGEINT) + {b}) % {_M} AS UBIGINT)"


def _rotl(x: str, r: int) -> str:
    return f"({_mulmod(x, 2 ** r)} | ({x} >> {64 - r}))"


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _fmix_steps(prefix: str, h_col: str) -> list[str]:
    """xxh64 avalanche: 5 CTE steps named {prefix}1..{prefix}5, the
    last exposing column ``h``."""
    return [
        f"{prefix}1 AS (SELECT *, {_xor(h_col, f'{h_col} >> 33')} AS {prefix}_a FROM __PREV__)",
        f"{prefix}2 AS (SELECT *, {_mulmod(f'{prefix}_a', _P2)} AS {prefix}_b FROM __PREV__)",
        f"{prefix}3 AS (SELECT *, {_xor(f'{prefix}_b', f'{prefix}_b >> 29')} AS {prefix}_c FROM __PREV__)",
        f"{prefix}4 AS (SELECT *, {_mulmod(f'{prefix}_c', _P3)} AS {prefix}_d FROM __PREV__)",
        f"{prefix}5 AS (SELECT *, {_xor(f'{prefix}_d', f'{prefix}_d >> 32')} AS {prefix}_h FROM __PREV__)",
    ]


def xxhash64_bucket_cte(key_col: str, seed: int, granularity: int,
                        source_sql: str, keep_cols: str,
                        bucket_col: str = "bucket") -> str:
    """A WITH-clause prefix computing Spark's
    ``pmod(xxhash64(key_col, lit(seed)), granularity)`` per row.

    Returns SQL text ``WITH ... , final AS (SELECT keep_cols, bucket
    FROM ...)`` — append your own SELECT over ``final``. ``source_sql``
    is the FROM-able source (table name or subquery); ``keep_cols``
    are passthrough columns to carry to ``final``.
    """
    c0 = _addmod("CAST(42 AS UBIGINT)", _P5 + 8)          # hashLong init, seed 42
    steps = [
        # two's-complement reinterpret: negative BIGINT keys map to the
        # same 64-bit pattern Spark hashes (plain CAST would raise)
        f"x0 AS (SELECT {keep_cols}, CAST((CAST({key_col} AS HUGEINT) "
        f"+ {_M}) % {_M} AS UBIGINT) AS xk FROM {source_sql})",
        f"x1 AS (SELECT *, {_rotl(_mulmod('xk', _P2), 31)} AS k1 FROM __PREV__)",
        f"x2 AS (SELECT *, {_xor(c0, _mulmod('k1', _P1))} AS lh0 FROM __PREV__)",
        f"x3 AS (SELECT *, {_addmod(_mulmod(_rotl('lh0', 27), _P1), _P4)} AS lh1 FROM __PREV__)",
        *_fmix_steps("lf", "lh1"),
        # hashInt(seed, h): 4-byte path; (seed & 0xFFFFFFFF) * P1 is a constant
        f"y0 AS (SELECT *, {_addmod('lf_h', _P5 + 4)} AS ih0 FROM __PREV__)",
        f"y1 AS (SELECT *, {_xor('ih0', _mulmod(str((seed & 0xFFFFFFFF)), _P1))} AS ih1 FROM __PREV__)",
        f"y2 AS (SELECT *, {_addmod(_mulmod(_rotl('ih1', 23), _P2), _P3)} AS ih2 FROM __PREV__)",
        *_fmix_steps("zf", "ih2"),
        (f"final AS (SELECT {keep_cols}, "
         f"CAST((((CASE WHEN zf_h >= CAST(9223372036854775808 AS UBIGINT) "
         f"THEN CAST(zf_h AS HUGEINT) - {_M} ELSE CAST(zf_h AS HUGEINT) END) "
         f"% {granularity}) + {granularity}) % {granularity} AS BIGINT) "
         f"AS {bucket_col} FROM __PREV__)"),
    ]
    prev = None
    out = []
    for s in steps:
        name = s.split(" AS ", 1)[0].strip()
        out.append(s.replace("__PREV__", prev) if prev else s)
        prev = name
    return "WITH " + ",\n".join(out)
