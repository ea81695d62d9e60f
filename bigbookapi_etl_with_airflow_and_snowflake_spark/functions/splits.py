"""Shared constants for the deterministic hash-split convention.

One definition, consumed by the DataFrame query
(``queries_ext.q_train_test_split``), the curation decision's held-out
predicate, and the SQL-facade UDF (``sqlfuncs.split_of``) — the three
must agree byte-for-byte or the same document lands in different splits
depending on which surface asked.

The split is an md5-prefix compare: md5(key || SPLIT_SALT) < 'e6' is
train ('e6' = 230/256 ≈ 89.8%), < 'f3' is val ('f3' = 243/256 ≈ 94.9%),
else test — portable (md5 is engine-independent), rerun-stable,
shuffle-free.
"""

from __future__ import annotations

SPLIT_SALT = "#split"
TRAIN_UPPER_HEX = "e6"  # md5 hex prefix below this → train (≈ 0.898)
VAL_UPPER_HEX = "f3"  # … below this → val (≈ 0.949); else test
