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


def _inline_run(rng: random.Random) -> str:
    kind = rng.randrange(6)
    words = _sentence(rng, rng.randint(2, 6))
    if kind == 0:
        return f"<b>{words}</b>"
    if kind == 1:
        return f"<i>{words}</i>"
    if kind == 2:
        return f"<a href=\"/page/{rng.randrange(1000)}\">{words}</a>"
    if kind == 3:
        return f"<code>{words.replace(' ', '_')}</code>"
    if kind == 4:
        return rng.choice(_UNICODE_SNIPPETS)
    return words


def _paragraph(rng: random.Random) -> str:
    runs = " ".join(_inline_run(rng) for _ in range(rng.randint(1, 5)))
    return f"<p>{_sentence(rng, rng.randint(4, 12))} {runs}.</p>"


def _list(rng: random.Random, ordered: bool, nested: bool) -> str:
    tag = "ol" if ordered else "ul"
    attrs = ""
    if ordered and rng.random() < 0.5:
        attrs = f' start="{rng.choice([0, 2, 5, 42])}"'
    items = []
    for _ in range(rng.randint(2, 5)):
        body = _sentence(rng, rng.randint(2, 6))
        if nested and rng.random() < 0.4:
            body += _list(rng, not ordered, nested=False)
        items.append(f"<li>{body}</li>")
    return f"<{tag}{attrs}>{''.join(items)}</{tag}>"


def _table(rng: random.Random) -> str:
    cols = rng.randint(2, 4)
    rows = rng.randint(2, 5)
    out = ["<table>", "<tr>" + "".join(f"<th>h{c}</th>" for c in range(cols)) + "</tr>"]
    for r in range(rows):
        cells = []
        c = 0
        while c < cols:
            span = 2 if (c + 1 < cols and rng.random() < 0.2) else 1
            attr = f' colspan="{span}"' if span > 1 else ""
            cells.append(f"<td{attr}>{_sentence(rng, 2)} {r}{c}</td>")
            c += span
        out.append("<tr>" + "".join(cells) + "</tr>")
    out.append("</table>")
    return "".join(out)


def _figure(rng: random.Random) -> str:
    i = rng.randrange(100)
    if rng.random() < 0.5:
        return (f'<figure><img src="img{i}.png" alt="alt {i}"/>'
                f"<figcaption>Caption {_sentence(rng, 3)}</figcaption></figure>")
    return f'<img src="img{i}.png" alt="figure {i}"/>'


def _pre(rng: random.Random) -> str:
    lines = "\n".join(f"x{j} = f({j})" for j in range(rng.randint(2, 5)))
    return f"<pre><code>{lines}</code></pre>"


def _noise(rng: random.Random) -> str:
    return rng.choice([
        "<script>var a = 1;</script>",
        "<style>p { color: red; }</style>",
        f'<div hidden>cookie banner {rng.randrange(10)}</div>',
        f'<nav hidden><ul><li>menu {rng.randrange(10)}</li></ul></nav>',
    ])


def make_html(rng: random.Random, doc_idx: int, n_sections: int) -> str:
    parts = [
        "<html><head>",
        f"<title>Synthetic page {doc_idx}</title>",
        _noise(rng),
        "</head><body>",
        f"<h1>Document {doc_idx}</h1>",
        _paragraph(rng),
    ]
    level = 2
    for s in range(n_sections):
        # occasionally skip a heading level to exercise invisible groups
        level = min(6, max(2, level + rng.choice([-1, 0, 0, 1, 2])))
        parts.append(f"<h{level}>Section {doc_idx}.{s}</h{level}>")
        for _ in range(rng.randint(1, 4)):
            roll = rng.random()
            if roll < 0.45:
                parts.append(_paragraph(rng))
            elif roll < 0.6:
                parts.append(_list(rng, ordered=rng.random() < 0.5, nested=True))
            elif roll < 0.75:
                parts.append(_table(rng))
            elif roll < 0.85:
                parts.append(_figure(rng))
            elif roll < 0.95:
                parts.append(_pre(rng))
            else:
                parts.append(_noise(rng))
    if rng.random() < 0.3:
        parts.append(f"<details><summary>More</summary><p>{_sentence(rng, 6)}</p></details>")
    if rng.random() < 0.3:
        parts.append(f"<footer><p>footer {_sentence(rng, 4)}</p></footer>")
    parts.append("</body></html>")
    return "".join(parts)


def make_rows(start: int, count: int, seed: int = 42,
              skew_every: int = 50) -> dict:
    """Build ``count`` rows [start, start+count) as python lists (columnar)."""
    t0 = datetime(2024, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + count):
        rng = random.Random((seed << 20) ^ i)
        n_sections = rng.randint(1, 4)
        if skew_every and i and i % skew_every == 0:
            n_sections *= rng.randint(10, 50)  # long-tail giant documents
        html = make_html(rng, i, n_sections)
        lang = LANGS[i % len(LANGS)]
        urls.append(f"https://synthetic-{seed}.example.org/{lang}/doc-{i}")
        tss.append(t0 + timedelta(seconds=17 * i))
        htmls.append(html.encode("utf-8"))
        texts.append(_sentence(random.Random(i), 20))
        langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def make_table(n: int, seed: int = 42, start: int = 0, skew_every: int = 50) -> pa.Table:
    return pa.table(make_rows(start, n, seed=seed, skew_every=skew_every), schema=SCHEMA)


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
