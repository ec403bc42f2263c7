"""spark-linkage: a PySpark-native record-linkage / entity-resolution engine.

Re-expresses the query and data-processing capabilities of the
ihmeuw/person_linkage_case_study reference (a pandas/Dask/Splink emulation of
the Census Bureau's PVS) as idiomatic Spark DataFrame programs: declarative
logical plans optimized by Catalyst, shuffle-aware physical design, and
Arrow-vectorized Python only where the built-in operators cannot express the
semantics (phonetic encodings, Jaro-Winkler).

Subpackages
-----------
sources     parquet/csv IO, record-id minting, lineage pair tables
functions   scalar function library (standardize, phonetics, similarity)
operators   relational building blocks (dedup, joins, blocking, gamma,
            Fellegi-Sunter scoring, parameter estimation)
plans       end-to-end pipelines (preprocess, cascade, reference files,
            accuracy harness)
streaming   Structured Streaming equivalents of the batch operators
textops     text analysis for training-data pipelines (langid, quality,
            tokens, fingerprints)
dedup       document dedup (exact, minhash-LSH, simhash, n-gram jaccard,
            embedding near-dup)
similarity  approximate nearest-neighbor search over embedding columns
multimodal  binary media column plumbing (decode stubs, real Spark plumbing)
"""

__version__ = "0.1.0"
