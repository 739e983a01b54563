"""DuckDB twin of graft.Tables' scaled-dir convention (dev tool).

`"<base>@<k>"` = the base sf dir with every FACT table unioned k times:
copy c shifts identity/join keys by c*10^9, Caesar-rotates document
text by c, and circularly rotates embeddings by c positions — the
EXACT mapping `graft.Tables.scaledCopy` applies on the Spark side
(keep the two in lockstep; `compare.py` on a scaled dir is the proof
they agree, hash-for-hash, on all queries). Dimension tables stay
unscaled.
"""

KEY_SHIFT = 1_000_000_000
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
SCALED_TABLES = {"documents", "embeddings", "lineitem", "orders", "events"}
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def parse_scale(sf_dir):
    """Split 'base@k' into (base, k); plain dirs give (dir, 1)."""
    if "@" in sf_dir:
        base, k = sf_dir.rsplit("@", 1)
        return base, int(k)
    return sf_dir, 1


def _rot_alpha(c):
    # Affine cipher x -> (a*x + b) mod 26, the exact twin of
    # graft.Tables.rotAlpha: a = 1 (classic rotation) for c < 26,
    # a = 3 for the 26..51 block, so copies past @26 stay disjoint
    # (a pure rotation has period 26 and copy 26 == copy 0).
    a = 1 if c < 26 else 3
    b = c % 26

    def sub(alpha):
        return "".join(alpha[(a * x + b) % 26] for x in range(26))

    return sub(LOWER) + sub(UPPER)


def _copy_select(table, path, c):
    shift = c * KEY_SHIFT
    if table == "documents":
        return (f"SELECT doc_id + {shift} AS doc_id, "
                f"translate(text, '{LOWER + UPPER}', '{_rot_alpha(c)}') AS text, "
                f"lang, source, n_chars FROM read_parquet('{path}')")
    if table == "embeddings":
        # rotation by c < dim (64); list slices are 1-based inclusive,
        # embedding[1:0] is the empty list (c = 0 -> identity)
        return (f"SELECT vec_id + {shift} AS vec_id, "
                f"list_concat(embedding[{c + 1}:len(embedding)], "
                f"embedding[1:{c}]) AS embedding, "
                f"label FROM read_parquet('{path}')")
    if table == "lineitem":
        return (f"SELECT * REPLACE (l_orderkey + {shift} AS l_orderkey) "
                f"FROM read_parquet('{path}')")
    if table == "orders":
        return (f"SELECT * REPLACE (o_orderkey + {shift} AS o_orderkey) "
                f"FROM read_parquet('{path}')")
    if table == "events":
        return (f"SELECT * REPLACE (event_id + {shift} AS event_id, "
                f"user_id + {shift} AS user_id) "
                f"FROM read_parquet('{path}')")
    raise ValueError(table)


def create_views(con, sf_dir):
    """CREATE VIEW per table on `con`, honoring a scaled '<base>@<k>' dir."""
    base, k = parse_scale(sf_dir)
    for t in TABLES:
        path = f"{base}/{t}.parquet"
        if k == 1 or t not in SCALED_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        else:
            union = " UNION ALL ".join(
                _copy_select(t, path, c) for c in range(k))
            con.execute(f"CREATE VIEW {t} AS {union}")
