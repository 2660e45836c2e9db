"""Large-scale data-pipeline operators (beyond the reference surface).

- ``dedup``       exact / n-gram Jaccard / MinHash-LSH / SimHash /
                  repeated-span discovery+removal / novelty filter /
                  connected components
- ``text``        token stats, quality scoring, language-ID, fingerprints
- ``similarity``  embedding cosine KNN (brute-force + LSH-bucketed)
- ``multimodal``  binary-column plumbing with stubbed decoders
- ``corpus``      sampling, chunking, packing, caps, skew tooling,
                  distributed prefix sums / row numbering
- ``quality``     column profiling, referential-integrity audits
- ``events``      N-stage funnels, backward-inclusive as-of joins

All operators are pure DataFrame -> DataFrame transformers: no driver
collects, JVM-side expressions only (no Python row UDFs in any hot
path), shuffle keys chosen to stay balanced at 100 TB.
"""
