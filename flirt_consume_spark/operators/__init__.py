"""Operator library: pure ``DataFrame -> DataFrame`` transforms.

Modules mirror SURVEY.md §2's inventory:

- relational  — projection/filter (P), joins (J1–J5), aggregation (A),
                sorts/limits/set ops (O)
- windows     — window functions + rank-dedup (W)
- temporal    — schedule expansion, time normalization, as-of join (E, J6)
- text        — text analysis & fingerprinting (L4 + pipeline extras)
- dedup       — exact/MinHash/SimHash/n-gram dedup (L1/L2 + extras)
- similarity  — cosine kNN, LSH-bucketed ANN, centroids (J7/L3/L6)
- multimodal  — binary asset columns + Pandas-UDF plumbing (L5)
"""
