"""Declared schemas for every source the engine reads.

The reference enforces schema imperatively (pandas inference + coercion,
reference scripts/transform.py:43-46); here every production read declares
its StructType up front — no inference, so a 100 TB scan never pays a
sampling pass and schema drift fails loudly at the scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw BigBookAPI book object (reference output/raw_data.json; FIXTURES.md F1).
# The API wraps each book in a single-element array; we read the wrapper as
# array<struct> and unwrap with element_at (SURVEY §2.3 T1).
BOOK_STRUCT = T.StructType(
    [
        # id / rating.average parsed as strings, coerced in the transform:
        # reference T5 accepts "3.0"-style ids (int(float(x))) and T7 nulls
        # only the bad field (pd.to_numeric errors='coerce'), whereas a
        # typed JSON parse would null the row in PERMISSIVE mode.
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("subtitle", T.StringType()),  # dropped by transform (T4)
        T.StructField(
            "authors",
            T.ArrayType(
                T.StructType(
                    [
                        # string: reference stringifies author ids verbatim
                        # (str(x), transform.py:44); JSON int tokens render
                        # to their literal text, matching str(int).
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField(
            "rating",
            T.StructType([T.StructField("average", T.StringType())]),
        ),
    ]
)

# Each record of the raw dump is `[{...book...}]` (157/157 observed).
RAW_BOOKS_SCHEMA = T.StructType([T.StructField("value", T.ArrayType(BOOK_STRUCT))])

# The `books` relational table (reference dags/bigbookapi.py:150-158 DDL).
BOOKS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("rating", T.DoubleType()),
        T.StructField("author_id", T.ArrayType(T.StringType())),
        T.StructField("author_name", T.ArrayType(T.StringType())),
    ]
)

# The `ai_models` table (reference huggingface_extract.py:128-136 (pyc)).
AI_MODELS_SCHEMA = T.StructType(
    [
        T.StructField("model_id", T.StringType(), False),
        T.StructField("author", T.StringType()),
        T.StructField("pipeline_tag", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("last_modified", T.TimestampType()),
    ]
)
