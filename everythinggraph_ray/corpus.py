"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md F1).

Generates the ``pages`` table BASELINE.json's input_hint mandates:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
with a seeded power-law link structure:

- site sizes Zipf-ish (a few hub sites dominate)
- preferential-attachment in-degree + a designated mega-hub receiving ~8%
  of all in-links (exercises hub splitting)
- >=2 weakly-connected components plus isolated pages
- self-links, duplicate links, fragment/off-corpus/relative hrefs
- ~10% dangling pages (zero out-links; PageRank drops their mass, matching
  /root/reference/pagerank_simple.c:51 where a dangling src simply has no
  edges to push over)
- ~1% of urls duplicated with a later warc_ts and different html
  (dedup-keep-latest test)

``text`` is by construction ``html.extract_text(html_bytes)`` — the byte
identity oracle column. Everything is a pure function of ``(n_pages, seed)``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from everythinggraph_ray.html import extract_text

_WORDS = (
    "graph rank crawl page link node edge web data index query batch "
    "stream actor block shuffle vertex degree label frontier partition "
    "arrow parquet cluster hash superstep gather scatter combine"
).split()

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _site_of_page(i: int, n_sites: int, rng: np.random.Generator) -> int:
    # power-law site popularity: site = floor(n_sites * u^2) biases small ids
    return int(n_sites * rng.random() ** 2.2)


def page_url(site: int, k: int) -> str:
    return f"https://site{site}.example/p/{k}"


def generate_pages(n_pages: int, seed: int = 42) -> pa.Table:
    """Build the corpus as one Arrow table (deterministic in n_pages, seed)."""
    rng = np.random.default_rng(seed)
    n_sites = max(3, n_pages // 40)

    # --- static layout: component + site + per-site page index -------------
    comp_bounds = [0.78, 0.93, 0.98]  # comp0, comp1, comp2, rest isolated
    comps = np.searchsorted(comp_bounds, rng.random(n_pages), side="right")
    sites = np.array([_site_of_page(i, n_sites, rng) for i in range(n_pages)])
    # per-site running index => unique urls
    site_counter: dict[int, int] = {}
    page_keys = np.empty(n_pages, dtype=np.int64)
    for i in range(n_pages):
        c = site_counter.get(sites[i], 0)
        page_keys[i] = c
        site_counter[sites[i]] = c + 1
    urls = [page_url(sites[i], page_keys[i]) for i in range(n_pages)]

    comp_members: list[list[int]] = [[], [], []]
    for i in range(n_pages):
        if comps[i] < 3:
            comp_members[comps[i]].append(i)
    hub = comp_members[0][0] if comp_members[0] else 0

    langs = np.where(
        rng.random(n_pages) < 0.90, "en", np.where(rng.random(n_pages) < 0.5, "de", "fr")
    )

    # preferential-attachment pools (indices repeated once per in-link)
    pools: list[list[int]] = [list(m) for m in comp_members]

    def _para(rng: np.random.Generator) -> str:
        n = int(rng.integers(5, 25))
        return " ".join(_WORDS[int(j)] for j in rng.integers(0, len(_WORDS), n))

    html_rows: list[bytes] = []
    ts_rows = np.empty(n_pages, dtype=np.int64)
    for i in range(n_pages):
        c = comps[i]
        parts = [
            f"<html><head><title>Page {page_keys[i]} of site{sites[i]}</title>",
        ]
        if rng.random() < 0.15:
            parts.append("<script>var x = 1 < 2 && 3 > 2;</script>")
        if rng.random() < 0.1:
            parts.append("<style>body { color: #000; }</style>")
        parts.append("</head><body>")
        parts.append(f"<h1>Site {sites[i]} &amp; page {page_keys[i]}</h1>")
        n_paras = int(rng.integers(1, 4))
        for _ in range(n_paras):
            parts.append(f"<p>{_para(rng)}</p>")

        # ----- out-links --------------------------------------------------
        hrefs: list[str] = []
        dangling = rng.random() < 0.10
        if c < 3 and not dangling and len(comp_members[c]) > 1:
            k_out = 1 + min(int(rng.pareto(1.6)), 20)
            for _ in range(k_out):
                if c == 0 and rng.random() < 0.08:
                    t = hub  # mega-hub in-link
                elif rng.random() < 0.35 or not pools[c]:
                    t = comp_members[c][int(rng.integers(0, len(comp_members[c])))]
                else:
                    t = pools[c][int(rng.integers(0, len(pools[c])))]
                pools[c].append(t)
                target_url = urls[t]
                r = rng.random()
                if r < 0.6 or sites[t] != sites[i]:
                    hrefs.append(target_url)  # absolute
                else:
                    hrefs.append(f"/p/{page_keys[t]}")  # relative same-site
            if rng.random() < 0.05:
                hrefs.append(urls[i])  # self-link
            if hrefs and rng.random() < 0.10:
                hrefs.append(hrefs[0])  # duplicate link
        # off-corpus links: the external-domain pool is PARTITIONED per
        # component (comp c links only to external{c*50..c*50+49}) and
        # dangling pages get none — a shared pool merged the designed
        # weakly-connected components through common external vertices and
        # gave "dangling" pages out-links (round-2 review finding)
        if not dangling and rng.random() < 0.07:
            hrefs.append(
                f"https://external{int(c) * 50 + int(rng.integers(0, 50))}.example.org/x"
            )
        if rng.random() < 0.10:
            hrefs.append("#section-1")  # fragment-only, dropped by extractor
        for j, h in enumerate(hrefs):
            parts.append(f'<p>see <a href="{h}">link {j}</a></p>')
        parts.append("</body></html>")
        html_rows.append("".join(parts).encode("utf-8"))
        ts_rows[i] = BASE_TS_US + i * 1_000_000 + int(rng.integers(0, 1000))

    # ----- ~1% duplicated urls with a LATER warc_ts and different html ----
    n_dup = max(1, n_pages // 100)
    dup_idx = rng.choice(n_pages, size=n_dup, replace=False)
    dup_urls, dup_html, dup_ts, dup_lang = [], [], [], []
    for i in dup_idx:
        body = html_rows[i].decode("utf-8").replace(
            "</body></html>", f"<p>revision two {_para(rng)}</p></body></html>"
        )
        dup_urls.append(urls[i])
        dup_html.append(body.encode("utf-8"))
        dup_ts.append(BASE_TS_US + (n_pages + int(i)) * 1_000_000)  # strictly later
        dup_lang.append(str(langs[i]))

    all_urls = urls + dup_urls
    all_html = html_rows + dup_html
    all_ts = np.concatenate([ts_rows, np.asarray(dup_ts, dtype=np.int64)])
    all_lang = [str(x) for x in langs] + dup_lang
    all_text = [extract_text(h) for h in all_html]

    return pa.table(
        {
            "url": pa.array(all_urls, pa.string()),
            "warc_ts": pa.array(all_ts, pa.timestamp("us")),
            "html": pa.array(all_html, pa.binary()),
            "text": pa.array(all_text, pa.string()),
            "lang": pa.array(all_lang, pa.string()),
        }
    )


def corpus_path(n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus") -> str:
    """Corpus directory for (n_pages, seed) WITHOUT materializing it —
    for oracle SQL generation at import time (ensure_corpus writes)."""
    return os.path.join(root, f"pages_n{n_pages}_s{seed}_v2")


def ensure_corpus(n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus") -> str:
    """Write (once) and return the parquet path for a (n_pages, seed) corpus.

    Cached under /tmp keyed by size+seed; multi-file layout so Ray Data
    reads it with parallelism.
    """
    # v2: partitioned external-domain pools + truly dangling pages
    d = os.path.join(root, f"pages_n{n_pages}_s{seed}_v2")
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    # scratch dir + atomic rename (the build_graph pattern): two concurrent
    # callers must never see each other's half-written part files
    import shutil
    import uuid

    work = f"{d}.building-{uuid.uuid4().hex[:8]}"
    os.makedirs(work, exist_ok=True)
    t = generate_pages(n_pages, seed)
    n_files = max(1, min(32, n_pages // 2000))
    rows_per = (t.num_rows + n_files - 1) // n_files
    for f in range(n_files):
        chunk = t.slice(f * rows_per, rows_per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(work, f"part-{f:04d}.parquet"))
    with open(os.path.join(work, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(work, d)
    except OSError:  # a concurrent caller won the race: use theirs
        shutil.rmtree(work, ignore_errors=True)
    return d


def web_oracle_edges_path(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    """Deterministic /tmp path of the serial-reference web edge table —
    computable WITHOUT materializing it (the oracle SQL strings embed this
    path at import; ``ensure_web_oracle_edges`` fills it lazily)."""
    return os.path.join(root, f"web_oracle_edges_n{n_pages}_s{seed}_v2.parquet")


def ensure_web_oracle_edges(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    """Write (once) and return a SERIAL-reference ``(src, dst)`` vid edge
    table for the DuckDB web-graph oracles.

    This is the independent side of the web flagship correctness check
    (round-3 VERDICT item 1): the whole pipeline — keep-latest capture per
    url, per-page link extraction, url→vid hashing — runs SERIALLY through
    the reference functions (:mod:`everythinggraph_ray.html`,
    :mod:`everythinggraph_ray.hashing`), never through Ray, and the result
    is parked at a deterministic /tmp path that the oracle SQL reads with
    ``read_parquet``. DuckDB then densely renumbers the vids
    (``row_number() OVER (ORDER BY vid)``) and re-derives PageRank/WCC in
    pure SQL, so the driver's hash check compares the DISTRIBUTED
    extract→renumber→kernel path against a serial+SQL derivation that
    shares no Ray code. Duplicate links are kept (multiplicity — the
    reference treats duplicate edges as multiplicity, init_all.h has no
    dedup), matching stages/extract.pages_to_edges.
    """
    import pandas as pd

    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.html import extract_links

    path = web_oracle_edges_path(n_pages, seed, root)
    if os.path.exists(path):
        return path
    corpus = ensure_corpus(n_pages, seed, root=root)
    t = pq.read_table(corpus, columns=["url", "warc_ts", "html"])
    df = pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "ts": t["warc_ts"].to_pandas(),
            "html": t["html"].to_pylist(),
        }
    )
    # keep-latest capture per url (corpus guarantees distinct ts per url)
    df = df.sort_values("ts", kind="stable").groupby("url", as_index=False).tail(1)
    src_urls: list[str] = []
    dst_urls: list[str] = []
    for u, h in zip(df["url"], df["html"]):
        for link in extract_links(h, u):
            src_urls.append(u)
            dst_urls.append(link)
    # v2: urls ride alongside the vids so the SQL oracles can derive
    # url-level facts (hosts/domains) without the blake2b hash
    out = pa.table(
        {
            "src_url": pa.array(src_urls, pa.string()),
            "dst_url": pa.array(dst_urls, pa.string()),
            "src": pa.array(urls_to_vids(src_urls), pa.int64()),
            "dst": pa.array(urls_to_vids(dst_urls), pa.int64()),
        }
    )
    import uuid

    work = f"{path}.building-{uuid.uuid4().hex[:8]}"
    pq.write_table(out, work)
    try:
        os.rename(work, path)
    except OSError:
        os.unlink(work)
    return path


def web_oracle_text_path(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    return os.path.join(root, f"web_oracle_text_n{n_pages}_s{seed}_v1.parquet")


def ensure_web_oracle_text(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    """SERIAL-reference (url, text) table — latest capture per url, text
    via the reference extractor. The DuckDB oracle for web_extract_text
    reads this, making the north rule's per-row BYTE-IDENTITY invariant
    a driver-visible hash check (not just a pytest)."""
    import pandas as pd

    from everythinggraph_ray.html import extract_text

    path = web_oracle_text_path(n_pages, seed, root)
    if os.path.exists(path):
        return path
    corpus = ensure_corpus(n_pages, seed, root=root)
    t = pq.read_table(corpus, columns=["url", "warc_ts", "html"])
    df = pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "ts": t["warc_ts"].to_pandas(),
            "html": t["html"].to_pylist(),
        }
    )
    df = df.sort_values("ts", kind="stable").groupby("url", as_index=False).tail(1)
    out = pa.table(
        {
            "url": pa.array(df["url"].tolist(), pa.string()),
            "text": pa.array([extract_text(h) for h in df["html"]], pa.string()),
        }
    )
    import uuid

    work = f"{path}.building-{uuid.uuid4().hex[:8]}"
    pq.write_table(out, work)
    try:
        os.rename(work, path)
    except OSError:
        os.unlink(work)
    return path


def web_oracle_anchors_path(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    return os.path.join(root, f"web_oracle_anchors_n{n_pages}_s{seed}_v1.parquet")


def ensure_web_oracle_anchors(
    n_pages: int, seed: int = 42, root: str = "/tmp/egray_corpus"
) -> str:
    """SERIAL-reference (dst_url, anchor) rows — one per anchor
    occurrence over EVERY capture (the anchor-text aggregation runs over
    all captures, matching q_web_anchor_text). DuckDB re-derives the
    top-20 (count, target, text) from this."""
    from everythinggraph_ray.html import extract_anchors

    path = web_oracle_anchors_path(n_pages, seed, root)
    if os.path.exists(path):
        return path
    corpus = ensure_corpus(n_pages, seed, root=root)
    t = pq.read_table(corpus, columns=["url", "html"])
    dsts: list[str] = []
    anchors: list[str] = []
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        for dst, text in extract_anchors(h, u):
            dsts.append(dst)
            anchors.append(text)
    out = pa.table(
        {
            "dst_url": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )
    import uuid

    work = f"{path}.building-{uuid.uuid4().hex[:8]}"
    pq.write_table(out, work)
    try:
        os.rename(work, path)
    except OSError:
        os.unlink(work)
    return path
