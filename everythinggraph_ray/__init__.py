"""everythinggraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the capabilities of
jmalicevic/EverythingGraph (the multicore graph-processing harness behind
USENIX ATC'17) as a distributed engine on Ray Data:

- ingest Common-Crawl-style Parquet pages ``(url, warc_ts, html, text, lang)``
- extract a url→url edge table (byte-identical text per url vs the serial
  reference extractor in :mod:`everythinggraph_ray.html`)
- hash-partition edges into per-partition CSR blocks held as numpy/Arrow
  buffers inside stateful Ray actors
- run PageRank / connected components / label propagation / BFS / SSSP /
  SpMV / triangle counting as gather-scatter supersteps with
  groupby-aggregate message combining
- plus the training-data-pipeline operators a 100 TB corpus needs:
  exact + MinHash/SimHash near-dedup, language id, quality scoring,
  token counting, fingerprinting, brute-force & LSH similarity search.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by
the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"

from everythinggraph_ray.hashing import url_to_vid  # noqa: F401
