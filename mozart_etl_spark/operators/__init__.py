"""Large-scale data-pipeline operators (beyond the reference surface).

- ``dedup``       exact / n-gram Jaccard / MinHash-LSH / SimHash
- ``text``        token stats, quality scoring, language-ID, fingerprints
- ``similarity``  embedding cosine KNN (brute-force + LSH-bucketed)
- ``multimodal``  binary-column plumbing with stubbed decoders

All operators are pure DataFrame -> DataFrame transformers: no driver
collects, JVM-side expressions only (no Python row UDFs in any hot
path), shuffle keys chosen to stay balanced at 100 TB.
"""
