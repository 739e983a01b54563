#!/usr/bin/env python3
"""One-shot refactoring aid (round 10): split the monolithic
ExtQueries.scala `all: Seq[Declared]` into per-family files.

Parses the Seq's top-level elements by paren counting that respects
Scala string literals (incl. triple-quoted) and comments, classifies
each Declared by its query-name prefix, and emits one
Ext<Family>Queries.scala per family plus a slim aggregator.
Behavior-preserving: every Declared block is moved verbatim.
"""
import re
import sys

SRC = "src/main/scala/graft/queries/ExtQueries.scala"

with open(SRC) as f:
    text = f.read()

start = text.index("val all: Seq[Declared] = Seq(")
open_paren = text.index("Seq(", start) + 3  # index of '('

# scan from open_paren, splitting depth-1 elements
i = open_paren + 1
depth = 1
elems = []
cur = []


def classify(elem):
    m = re.search(r'"(ext_[a-z0-9_]+)"', elem)
    if not m:
        sys.exit("no name in element: " + elem[:200])
    name = m.group(1)
    fam = name.split("_")[1]
    return name, fam


n = len(text)
while i < n and depth > 0:
    c = text[i]
    if text.startswith('"""', i):
        j = text.index('"""', i + 3)
        # swallow any extra trailing quotes ("""" sequences)
        while j + 3 < n and text[j + 3] == '"':
            j += 1
        cur.append(text[i:j + 3])
        i = j + 3
        continue
    if c == '"':
        j = i + 1
        while text[j] != '"':
            if text[j] == "\\":
                j += 1
            j += 1
        cur.append(text[i:j + 1])
        i = j + 1
        continue
    if text.startswith("//", i):
        j = text.index("\n", i)
        cur.append(text[i:j])
        i = j
        continue
    if text.startswith("/*", i):
        j = text.index("*/", i) + 2
        cur.append(text[i:j])
        i = j
        continue
    if c in "([{":
        depth += 1
    elif c in ")]}":
        depth -= 1
        if depth == 0:
            break
    if c == "," and depth == 1:
        elems.append("".join(cur))
        cur = []
        i += 1
        continue
    cur.append(c)
    i += 1

if "".join(cur).strip():
    elems.append("".join(cur))

print(f"parsed {len(elems)} elements")

families = {}
order = []
for e in elems:
    name, fam = classify(e)
    if fam not in families:
        families[fam] = []
        order.append(fam)
    families[fam].append(e.strip("\n"))

for fam in order:
    print(fam, len(families[fam]), [classify(e)[0] for e in families[fam]][:3])

HEADER = """package graft.queries

import graft.Tables
import graft.ext.{Curation, Dedup, Graph, Multimodal, PlanCache, Sampling, Search, Similarity, Skew, Stats, TextStats, TimeJoin}
import org.apache.spark.sql.functions._

import ExtShared._

"""

DOCS = {
    "dedup": "Deduplication family: exact / incremental / MinHash-LSH /\n  * SimHash / containment / component / canonical / embedding dedup\n  * over the documents corpus.",
    "text": "Text-analysis family: langid, quality, tokens, normalize,\n  * redact, domains, rolling-hash, repetition, surprisal, quantiles,\n  * TF-IDF/BM25/PMI/fuzzy search.",
    "stats": "Profiling/statistics family: cardinality, profile, histogram,\n  * skew, correlation, count-min, outliers.",
    "multimodal": "Multimodal family: real PNG/WAV/GIF decode, frames,\n  * channels, resize, batched featurizer.",
    "rel": "Relational family: pivot/cube/rollup, star join, set ops,\n  * as-of / range joins, sessionize, skew-salted join, sliding\n  * windows, grouped top-k.",
    "sim": "Similarity family: LSH census/recall/top-k, brute-force and\n  * IVF ANN, quantized scan.",
    "pipeline": "Pipeline family: end-to-end curation, packing, decontam,\n  * shard export, Z-order, sampling, splits, chunking, concat.",
    "graph": "Graph family: triangle count.",
    "stream": "Streaming family: gated Trigger.AvailableNow replays of the\n  * streaming operators.",
}

for fam in order:
    fname = f"src/main/scala/graft/queries/Ext{fam.capitalize()}Queries.scala"
    body = ",\n\n".join(families[fam])
    doc = DOCS.get(fam, fam + " family.")
    with open(fname, "w") as f:
        f.write(HEADER)
        f.write(f"/** {doc}\n  *\n  * Declared-query registry split out of the former monolithic\n  * ExtQueries.scala (round 10, mechanical — blocks moved verbatim);\n  * shared caps/CTE text/checksum helpers live in [[ExtShared]].\n  */\n")
        f.write(f"object Ext{fam.capitalize()}Queries {{\n\n  val all: Seq[Declared] = Seq(\n\n")
        f.write(body)
        f.write("\n  )\n}\n")
    print("wrote", fname)
