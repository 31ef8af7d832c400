#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare:
runs each oracle SQL, loads the Spark parquet result, sorts columns by name
and rows by all values, and diffs. Usage: check_oracle.py <sfDir> <verifyOut>

Values are compared at BIT level (driver hash semantics): floats are
canonicalized via struct.pack('>d'), so -0.0 != +0.0 and NaN == NaN —
Python's == (which says -0.0 == 0.0 and NaN != NaN) would pass results the
driver's value hash fails (this exact class bit round 2's q37)."""
import duckdb, json, sys, glob, os, struct

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def tok(v):
    """Bit-exact, totally-orderable token for one value."""
    if v is None:
        return 'n'
    if isinstance(v, bool):
        return f'B:{v}'
    if isinstance(v, float):
        return 'f:' + struct.pack('>d', v).hex()
    if isinstance(v, int):
        return f'i:{v:+025d}'
    if isinstance(v, (bytes, bytearray)):
        return 'b:' + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return 'l:[' + ','.join(tok(x) for x in v) + ']'
    if isinstance(v, dict):
        return 'd:{' + ','.join(f'{k}={tok(x)}' for k, x in sorted(v.items())) + '}'
    return f't:{type(v).__name__}:{v}'

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(tok(r[i]) for i in order) for r in rows]), sorted(cols)

def type_class(t):
    """Driver-hash-relevant type class for a DuckDB DESCRIBE type string.

    The round-2/round-3 misses were both type edges the value compare is
    blind to: DuckDB sum(BIGINT) -> HUGEINT surfaces as Arrow decimal128
    while Spark emits int64, and the driver's hash distinguishes them even
    when every value is identical.  Integer WIDTH (int32 vs int64) is NOT
    a failing class in the driver (q07/q20/etc. are hash-green), so all
    plain integer widths collapse to one class — but HUGEINT/DECIMAL is
    its own class and must fail against an integer column."""
    t = t.upper()
    if t.startswith('DECIMAL') or t in ('HUGEINT', 'UHUGEINT'):
        return 'decimal'
    if t in ('TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT',
             'UTINYINT', 'USMALLINT', 'UINTEGER', 'UBIGINT'):
        return 'int'
    if t in ('FLOAT', 'REAL', 'DOUBLE'):
        return 'float'
    if t.startswith('STRUCT') or t.startswith('MAP'):
        return 'struct'
    if t.endswith('[]') or t.startswith('LIST'):
        return 'list'
    return t  # VARCHAR, BOOLEAN, BLOB, DATE, TIMESTAMP..., exact match

def describe(q):
    return {r[0]: r[1] for r in con.execute(f'DESCRIBE {q}').fetchall()}

fails = 0
for name, sql in sorted(oracle.items()):
    pq = f'{out}/{name}'
    if not os.path.isdir(pq):
        print(f'{name}: MISSING spark output'); fails += 1; continue
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows, ocols_s = canon(o.fetchall(), ocols)
        s = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows, scols_s = canon(s.fetchall(), scols)
    except Exception as e:
        print(f'{name}: ERROR {e}'); fails += 1; continue
    if ocols_s != scols_s:
        print(f'{name}: SCHEMA MISMATCH oracle={ocols_s} spark={scols_s}'); fails += 1; continue
    try:
        otypes = describe(sql)
        stypes = describe(f"SELECT * FROM '{pq}/*.parquet'")
        badtypes = [(c, otypes[c], stypes[c]) for c in otypes
                    if type_class(otypes[c]) != type_class(stypes[c])]
    except Exception as e:
        print(f'{name}: DESCRIBE ERROR {e}'); fails += 1; continue
    if badtypes:
        print(f'{name}: TYPE MISMATCH (driver hash is type-sensitive): ' +
              ', '.join(f'{c} oracle={ot} spark={st}' for c, ot, st in badtypes))
        fails += 1
    elif len(orows) != len(srows):
        print(f'{name}: ROWCOUNT oracle={len(orows)} spark={len(srows)}'); fails += 1
    elif orows != srows:
        bad = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
        print(f'{name}: VALUE MISMATCH first diffs: {bad}'); fails += 1
    else:
        print(f'{name}: OK ({len(srows)} rows)')
print('FAILURES:', fails)
sys.exit(1 if fails else 0)
