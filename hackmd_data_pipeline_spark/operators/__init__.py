"""Extension operators (SURVEY.md §7 Phase 4, BASELINE.json north star).

Reusable, scale-designed implementations:
    dedup.py       MinHash+LSH near-dup, SimHash, exact-fingerprint helpers
    similarity.py  brute-force cosine top-k, IVF (KMeans-bucketed) ANN
    textstats.py   language ID, quality heuristics
    multimodal.py  opaque-binary columns + Pandas-UDF decode plumbing
"""
