"""Deterministic synthetic Common-Crawl-style web-pages corpus.

Produces the driver's ``input_hint`` table shape —
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
— with HTML bodies that exercise every branch of the extraction kernel
(mirroring the reference's fixture corpus ``/root/reference/tests/data/html``):
headings with skipped levels, nested/``start``-ed lists, span-ful tables,
``pre``/inline code, formatting and hyperlink runs, figures with captions,
footers/details, unicode needing sanitation, plus hidden/script boilerplate
that must be stripped.  Fully seeded — same (seed, n) always yields the same
bytes, so goldens and benches are reproducible without external data.

A long tail of oversized documents (every ``skew_every``-th row is inflated
10-50x) exercises the byte-size-bucket repartitioning required at 100 TB
scale.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa

LANGS = ("en", "de", "fr", "es", "zh")

_WORDS = (
    "stream data batch query table scan merge sort join filter shard spill "
    "vector page cell block arrow shuffle actor lineage manifest bucket "
    "column row group window partition index checkpoint backlog crawl"
).split()

_UNICODE_SNIPPETS = (
    "naïve café",          # nbsp
    "em—dash and en–dash",      # dashes
    "‘quoted’ “words”",
    "ellipsis… here",
    "soft­hyphen zero​width",
)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _inline_run(rng: random.Random) -> tuple[str, tuple]:
    """Returns (html, annotation key).  The key identifies the run's
    annotation set under the walker's annotated-run algebra: adjacent runs
    with EQUAL annotations (separated only by whitespace) merge into one
    item — plain with plain, bold with bold, hyperlinks only when the href
    matches."""
    kind = rng.randrange(6)
    words = _sentence(rng, rng.randint(2, 6))
    if kind == 0:
        return f"<b>{words}</b>", ("b",)
    if kind == 1:
        return f"<i>{words}</i>", ("i",)
    if kind == 2:
        href = f"/page/{rng.randrange(1000)}"
        return f"<a href=\"{href}\">{words}</a>", ("a", href)
    if kind == 3:
        return f"<code>{words.replace(' ', '_')}</code>", ("code",)
    if kind == 4:
        return rng.choice(_UNICODE_SNIPPETS), ("plain",)
    return words, ("plain",)


def _paragraph(rng: random.Random) -> tuple[str, int, list, list]:
    """Returns (html, expected item count, chunk events list, outlinks
    list — the ``(href, anchor_text)`` of every hyperlink run, in
    document order, derived from the SAME run draws so the rng call
    sequence is untouched).  A paragraph
    without formatting elements is ONE text item; with any formatting it
    becomes an inline group + one item per merged run: the run sequence is
    [lead sentence(plain)] + runs + [trailing '.'(plain)], whitespace
    separators vanish into either side, and adjacent runs with equal
    annotation keys collapse into one item.  Chunk events are one
    ``("text", n_tokens)`` per merged run (the chunker emits a chunk per
    leaf text item); a trailing '.' attaches to an open plain run without
    adding a token, or stands alone as one."""
    # NOTE: runs are drawn BEFORE the sentence — the original f-string
    # evaluation order; preserving the rng call sequence keeps every
    # committed corpus byte (and downstream golden) stable
    runs = [_inline_run(rng) for _ in range(rng.randint(1, 5))]
    sentence = _sentence(rng, rng.randint(4, 12))
    html = f"<p>{sentence} {' '.join(h for h, _ in runs)}.</p>"
    pieces = [(("plain",), len(sentence.split()))] + [
        (k, 1 if k == ("code",) else len(_run_words(h, k).split()))
        for h, k in runs]
    # collapse adjacent equal annotation keys
    groups: list[list] = []
    for key, tok in pieces:
        if groups and groups[-1][0] == key:
            groups[-1][1] += tok
        else:
            groups.append([key, tok])
    if groups[-1][0] == ("plain",):
        pass                      # '.' merges into the open plain run
    else:
        groups.append([("plain",), 1])   # '.' stands alone
    # inline code runs are code-labelled items: their chunks carry kind
    # "code" (usually hidden by the same-path merge, but a code run that
    # STARTS a merge group keeps it) and they count as enrichable items
    events = [("code" if key == ("code",) else "text", tok)
              for key, tok in groups]
    links = [(k[1], _run_words(h, k)) for h, k in runs if k[0] == "a"]
    if len(groups) == 1:
        return html, 1, events, links   # no formatting: single text item
    return html, 1 + len(groups), events, links  # group + merged runs


def _run_words(html_run: str, key: tuple) -> str:
    """Visible text of an inline run (strip the tag when present)."""
    if key == ("plain",):
        return html_run
    inner = html_run[html_run.index(">") + 1:html_run.rindex("<")]
    return inner


def _list(rng: random.Random, ordered: bool, nested: bool) -> tuple[str, int, int]:
    """Returns (html, expected item count, chunk tokens): 1 group + 1 per
    <li>, plus the nested sub-list's own group and items — the walker
    contract this corpus's TRUE golden is derived from.  The chunker
    flattens the whole (nested) list into ONE "list" chunk whose token
    count sums over all item lines."""
    tag = "ol" if ordered else "ul"
    attrs = ""
    if ordered and rng.random() < 0.5:
        attrs = f' start="{rng.choice([0, 2, 5, 42])}"'
    items = []
    count = 1
    tokens = 0
    for _ in range(rng.randint(2, 5)):
        body = _sentence(rng, rng.randint(2, 6))
        count += 1
        tokens += len(body.split())
        if nested and rng.random() < 0.4:
            sub_html, sub_count, sub_tokens = _list(rng, not ordered,
                                                    nested=False)
            body += sub_html
            count += sub_count
            tokens += sub_tokens
        items.append(f"<li>{body}</li>")
    return f"<{tag}{attrs}>{''.join(items)}</{tag}>", count, tokens


def _table(rng: random.Random) -> tuple[str, int]:
    """Returns (html, chunk tokens).  The chunker serializes the grid with
    spanned cells REPEATED per covered column, so a colspan-2 cell's 3
    tokens count twice; header cells are 1 token each."""
    cols = rng.randint(2, 4)
    rows = rng.randint(2, 5)
    out = ["<table>", "<tr>" + "".join(f"<th>h{c}</th>" for c in range(cols)) + "</tr>"]
    tokens = cols                       # "h0".."h{cols-1}", 1 token each
    for r in range(rows):
        cells = []
        c = 0
        while c < cols:
            span = 2 if (c + 1 < cols and rng.random() < 0.2) else 1
            attr = f' colspan="{span}"' if span > 1 else ""
            cells.append(f"<td{attr}>{_sentence(rng, 2)} {r}{c}</td>")
            tokens += 3 * span          # "w w rc" repeated per column
            c += span
        out.append("<tr>" + "".join(cells) + "</tr>")
    out.append("</table>")
    return "".join(out), tokens


def _figure(rng: random.Random) -> tuple[str, int]:
    """Returns (html, caption chunk tokens): "Caption {3 words}" = 4, or
    the alt text "figure {i}" = 2."""
    i = rng.randrange(100)
    if rng.random() < 0.5:
        return (f'<figure><img src="img{i}.png" alt="alt {i}"/>'
                f"<figcaption>Caption {_sentence(rng, 3)}</figcaption>"
                f"</figure>"), 4
    return f'<img src="img{i}.png" alt="figure {i}"/>', 2


def _pre(rng: random.Random) -> tuple[str, int]:
    """Returns (html, code chunk tokens): each line "xJ = f(J)" is 3."""
    n = rng.randint(2, 5)
    lines = "\n".join(f"x{j} = f({j})" for j in range(n))
    return f"<pre><code>{lines}</code></pre>", 3 * n


def _noise(rng: random.Random) -> str:
    return rng.choice([
        "<script>var a = 1;</script>",
        "<style>p { color: red; }</style>",
        f'<div hidden>cookie banner {rng.randrange(10)}</div>',
        f'<nav hidden><ul><li>menu {rng.randrange(10)}</li></ul></nav>',
    ])


def make_html(rng: random.Random, doc_idx: int,
              n_sections: int) -> tuple[str, int, list, int, list]:
    """Returns (html, expected item count, expected chunk rows,
    expected enrichable-item count, expected outlinks).

    Both expectations are derived WHILE EMITTING each construct — never by
    running the extractor — so they are pipeline-independent TRUE goldens.
    Item contract (the docling walk semantics this engine reproduces
    byte-exactly): <title> 1, heading 1 plus ``max(0, level - cur - 1)``
    invisible section groups for skipped levels (cur starts at 0), <p> 1
    or inline group + merged runs, list = 1 group + 1/li (+ nested
    group/items), table 1, figure/img 2 (picture + caption from figcaption
    or alt), pre 1, script/style/hidden 0, details = group + summary +
    body, footer = group + body.

    Chunk contract (``kernels/chunker.py``): one chunk per leaf text run /
    list / table / code / picture-caption under its heading path (title
    clears the path; section headers stack by level; footer is furniture,
    no chunks), then a greedy 256-token merge of adjacent same-path chunks
    (kind becomes "merged").  Expected rows are ``(kind, n_tokens)`` in
    document order."""
    parts = [
        "<html><head>",
        f"<title>Synthetic page {doc_idx}</title>",
        _noise(rng),
        "</head><body>",
        f"<h1>Document {doc_idx}</h1>",
    ]
    # chunk events: (heading_path, kind, tokens) in document order
    events: list[tuple[tuple, str, int]] = []
    path: list[tuple[int, str]] = [(0, f"Document {doc_idx}")]

    def snap() -> tuple:
        return tuple(text for _, text in path)

    links: list[tuple[str, str]] = []
    lead_html, lead_count, lead_events, lead_links = _paragraph(rng)
    parts.append(lead_html)
    events += [(snap(), k, t) for k, t in lead_events]
    links += lead_links
    n_items = 2 + lead_count   # title + h1 (cur 0 -> 1) + lead paragraph
    cur = 1
    level = 2
    for s in range(n_sections):
        # occasionally skip a heading level to exercise invisible groups
        level = min(6, max(2, level + rng.choice([-1, 0, 0, 1, 2])))
        heading = f"Section {doc_idx}.{s}"
        parts.append(f"<h{level}>{heading}</h{level}>")
        n_items += max(0, level - cur - 1) + 1
        cur = level
        # chunker stack semantics: pop to above this level, then push
        # (chunk level = html level - 1; the title sits at level 0)
        while path and path[-1][0] >= level - 1:
            path.pop()
        path.append((level - 1, heading))
        for _ in range(rng.randint(1, 4)):
            roll = rng.random()
            if roll < 0.45:
                p_html, p_count, p_events, p_links = _paragraph(rng)
                parts.append(p_html)
                n_items += p_count
                events += [(snap(), k, t) for k, t in p_events]
                links += p_links
            elif roll < 0.6:
                sub_html, sub_count, sub_tokens = _list(
                    rng, ordered=rng.random() < 0.5, nested=True)
                parts.append(sub_html)
                n_items += sub_count
                events.append((snap(), "list", sub_tokens))
            elif roll < 0.75:
                t_html, t_tokens = _table(rng)
                parts.append(t_html)
                n_items += 1
                events.append((snap(), "table", t_tokens))
            elif roll < 0.85:
                f_html, f_tokens = _figure(rng)
                parts.append(f_html)
                n_items += 2
                events.append((snap(), "picture", f_tokens))
            elif roll < 0.95:
                c_html, c_tokens = _pre(rng)
                parts.append(c_html)
                n_items += 1
                events.append((snap(), "code", c_tokens))
            else:
                parts.append(_noise(rng))
    if rng.random() < 0.3:
        detail_sent = _sentence(rng, 6)
        parts.append(f"<details><summary>More</summary><p>{detail_sent}</p></details>")
        n_items += 3
        events.append((snap(), "text", 1))                     # "More"
        events.append((snap(), "text", len(detail_sent.split())))
    if rng.random() < 0.3:
        parts.append(f"<footer><p>footer {_sentence(rng, 4)}</p></footer>")
        n_items += 2                    # furniture: items but no chunks
    parts.append("</body></html>")
    # enrichable items: code items (pre blocks + merged inline code runs)
    # and pictures — one stub annotation each (stages/enrich.py defaults)
    n_enrichable = sum(1 for _, k, _t in events if k in ("code", "picture"))
    # greedy same-path merge with the chunker's 256-token budget
    chunks: list[list] = []             # [path, kind, tokens]
    for p, k, t in events:
        if chunks and chunks[-1][0] == p and chunks[-1][2] + t <= 256:
            chunks[-1][1] = "merged"
            chunks[-1][2] += t
        else:
            chunks.append([p, k, t])
    return ("".join(parts), n_items, [(k, t) for _, k, t in chunks],
            n_enrichable, links)


def make_rows(start: int, count: int, seed: int = 42,
              skew_every: int = 50,
              with_expected: bool = False
              ) -> dict | tuple[dict, list, list, list]:
    """Build ``count`` rows [start, start+count) as python lists (columnar).

    With ``with_expected=True`` additionally returns the generator-side
    expected item counts, expected chunk rows, and expected
    enrichable-item counts per row (see ``make_html``)."""
    t0 = datetime(2024, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    expected: list[int] = []
    expected_chunks: list[list] = []
    expected_enrich: list[int] = []
    expected_links: list[list] = []
    for i in range(start, start + count):
        rng = random.Random((seed << 20) ^ i)
        n_sections = rng.randint(1, 4)
        if skew_every and i and i % skew_every == 0:
            n_sections *= rng.randint(10, 50)  # long-tail giant documents
        html, n_items, chunks, n_enrichable, links = make_html(
            rng, i, n_sections)
        lang = LANGS[i % len(LANGS)]
        urls.append(f"https://synthetic-{seed}.example.org/{lang}/doc-{i}")
        tss.append(t0 + timedelta(seconds=17 * i))
        htmls.append(html.encode("utf-8"))
        texts.append(_sentence(random.Random(i), 20))
        langs.append(lang)
        expected.append(n_items)
        expected_chunks.append(chunks)
        expected_enrich.append(n_enrichable)
        expected_links.append(links)
    data = {"url": urls, "warc_ts": tss, "html": htmls, "text": texts,
            "lang": langs}
    if with_expected:
        return data, expected, expected_chunks, expected_enrich, \
            expected_links
    return data


SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def make_table(n: int, seed: int = 42, start: int = 0, skew_every: int = 50) -> pa.Table:
    return pa.table(make_rows(start, n, seed=seed, skew_every=skew_every), schema=SCHEMA)


def make_expected_table(n: int, seed: int = 42, start: int = 0,
                        skew_every: int = 50) -> pa.Table:
    """Generator-side TRUE golden for the extraction pipeline:
    ``(url, doc_id, status, n_items)`` where ``doc_id`` is the sha-256 of
    the raw bytes (the documented input contract) and ``n_items`` is
    counted while emitting constructs (``make_html``) — both derivable
    from the input alone, never from running the extractor."""
    import hashlib

    data, expected, _, _, _ = make_rows(start, n, seed=seed,
                                     skew_every=skew_every,
                                     with_expected=True)
    doc_ids = [hashlib.sha256(h).hexdigest() for h in data["html"]]
    return pa.table({
        "url": pa.array(data["url"], pa.string()),
        "doc_id": pa.array(doc_ids, pa.string()),
        "status": pa.array(["success"] * n, pa.string()),
        "n_items": pa.array(expected, pa.int32()),
    })


def make_expected_corpus_chunks_table(n: int, seed: int = 42, start: int = 0,
                                      skew_every: int = 50,
                                      min_doc_tokens: int = 30) -> pa.Table:
    """TRUE golden for the COMPOSED corpus pipeline
    (``pipelines/corpus.corpus_chunks``): the expected chunk rows of every
    document whose total expected token count clears the quality floor.
    Planted duplicates (same bytes under a later-sorting url) are dropped
    upstream by exact dedup, so they are simply absent here — the caller
    plants them in the INPUT only."""
    data, _, expected_chunks, _, _ = make_rows(start, n, seed=seed,
                                            skew_every=skew_every,
                                            with_expected=True)
    urls, ids, toks, kinds = [], [], [], []
    for url, chunks in zip(data["url"], expected_chunks):
        if sum(t for _, t in chunks) < min_doc_tokens:
            continue
        for ci, (kind, tok) in enumerate(chunks):
            urls.append(url)
            ids.append(ci)
            toks.append(tok)
            kinds.append(kind)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "chunk_id": pa.array(ids, pa.int32()),
        "n_tokens": pa.array(toks, pa.int32()),
        "kind": pa.array(kinds, pa.string()),
    })


def plant_exact_dups(table: pa.Table, every: int = 10) -> pa.Table:
    """Append an exact duplicate (identical bytes, different url) of every
    ``every``-th row.  Duplicate urls sort AFTER every original url
    (zz- prefix), so keep-first-by-url dedup keeps the originals
    deterministically."""
    idx = list(range(0, table.num_rows, every))
    dups = table.take(pa.array(idx, pa.int64()))
    new_urls = pa.array([f"https://zz-dup.example.org/{i}" for i in idx],
                        pa.string())
    dups = dups.set_column(dups.schema.get_field_index("url"), "url",
                           new_urls)
    return pa.concat_tables([table, dups])


DUP_FAMILIES = ((10, 7), (40, 1), (160, 3), (640, 11))
"""Power-law duplicate families for the skewed stress corpus as
``(modulus, residue)`` index classes — pairwise disjoint by CRT (all
residues differ modulo each pairwise gcd).  Family 0 is one template at
10% of the corpus; each later family is ~4× rarer."""


def skewed_family_of(i: int) -> int:
    """Family id of corpus index ``i`` (-1 = unique doc)."""
    for f, (mod, res) in enumerate(DUP_FAMILIES):
        if i % mod == res:
            return f
    return -1


def make_skewed_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    """The skewed stress corpus: the uniform table with every
    ``DUP_FAMILIES`` member's html REPLACED by its family template's
    bytes (the doc at index = the family residue), so one content hash /
    MinHash signature covers 10% of all rows.  Urls stay distinct.
    Deterministic per (n, seed, start) and shard-decomposable: family
    membership is a pure function of the global index."""
    table = make_table(n, seed=seed, start=start)
    html = table["html"].to_pylist()
    templates: dict[int, bytes] = {}
    for f, (mod, res) in enumerate(DUP_FAMILIES):
        if res < start + n:
            templates[f] = make_table(1, seed=seed, start=res)["html"][0].as_py()
    for pos in range(n):
        f = skewed_family_of(start + pos)
        if f >= 0 and f in templates:
            html[pos] = templates[f]
    return table.set_column(table.schema.get_field_index("html"), "html",
                            pa.array(html, pa.large_binary()))


def write_skewed_corpus(path: str, n: int, seed: int = 42,
                        rows_per_file: int = 5000) -> list[str]:
    """Shard-wise ``make_skewed_table`` writer (same resumable layout as
    ``write_corpus``)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    for shard, start in enumerate(range(0, n, rows_per_file)):
        count = min(rows_per_file, n - start)
        fname = os.path.join(path, f"part-{shard:05d}.parquet")
        if not os.path.exists(fname):
            pq.write_table(make_skewed_table(count, seed=seed, start=start),
                           fname, row_group_size=128)
        files.append(fname)
    return files


def make_expected_chunks_table(n: int, seed: int = 42, start: int = 0,
                               skew_every: int = 50) -> pa.Table:
    """Generator-side TRUE golden for the chunking pipeline:
    ``(url, chunk_id, n_tokens, kind)`` rows simulated from the generative
    structure under the chunker contract (see ``make_html``) — never by
    running the extractor or chunker."""
    data, _, expected_chunks, _, _ = make_rows(start, n, seed=seed,
                                            skew_every=skew_every,
                                            with_expected=True)
    urls, ids, toks, kinds = [], [], [], []
    for url, chunks in zip(data["url"], expected_chunks):
        for ci, (kind, tok) in enumerate(chunks):
            urls.append(url)
            ids.append(ci)
            toks.append(tok)
            kinds.append(kind)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "chunk_id": pa.array(ids, pa.int32()),
        "n_tokens": pa.array(toks, pa.int32()),
        "kind": pa.array(kinds, pa.string()),
    })


def write_corpus(path: str, n: int, seed: int = 42, rows_per_file: int = 5000,
                 skew_every: int = 50) -> list[str]:
    """Write the corpus as one parquet file per shard (resumable layout:
    deterministic shard file names, one directory per corpus)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    for shard, start in enumerate(range(0, n, rows_per_file)):
        count = min(rows_per_file, n - start)
        fname = os.path.join(path, f"part-{shard:05d}.parquet")
        if not os.path.exists(fname):
            # small row groups keep single files splittable into many Ray
            # blocks — one fat row group would serialize the whole shard
            # onto one core
            pq.write_table(make_table(count, seed=seed, start=start,
                                      skew_every=skew_every), fname,
                           row_group_size=128)
        files.append(fname)
    return files


def make_expected_enrich_table(n: int, seed: int = 42, start: int = 0,
                               skew_every: int = 50) -> pa.Table:
    """Generator-side TRUE golden for the enrichment driver:
    ``(url, n_enriched)`` where n_enriched counts the doc's enrichable
    items — code items (pre blocks + merged inline code runs) and
    pictures, one stub annotation each under the default model pair
    (``stages/enrich.DEFAULT_ENRICHMENT_MODELS``) — derived from the
    construct stream, never by running the pipeline."""
    data, _, _, expected_enrich, _ = make_rows(start, n, seed=seed,
                                            skew_every=skew_every,
                                            with_expected=True)
    return pa.table({
        "url": pa.array(data["url"], pa.string()),
        "n_enriched": pa.array(expected_enrich, pa.int32()),
    })


def make_expected_outlinks_table(n: int, seed: int = 42, start: int = 0,
                                 skew_every: int = 50) -> pa.Table:
    """Generator-side TRUE golden for outlink extraction:
    ``(url, link_idx, href, anchor_text)`` — one row per hyperlink run
    in document order, derived from the construct stream while emitting
    (never by parsing the html)."""
    data, _, _, _, expected_links = make_rows(start, n, seed=seed,
                                              skew_every=skew_every,
                                              with_expected=True)
    urls, idxs, hrefs, texts = [], [], [], []
    for u, links in zip(data["url"], expected_links):
        for j, (href, text) in enumerate(links):
            urls.append(u)
            idxs.append(j)
            hrefs.append(href)
            texts.append(text)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "link_idx": pa.array(idxs, pa.int64()),
        "href": pa.array(hrefs, pa.string()),
        "anchor_text": pa.array(texts, pa.string()),
    })
