"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the input table of ``BASELINE.json input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a ``target_xml`` ground-truth column (JATS-style) mirroring the
document fixtures the reference's e2e tests build
(/root/reference/tests/auto_annotate_test_utils.py:100-129).

Every value is a pure function of (seed, doc_index): generation is
distributed with ``spark.range(n).mapInPandas`` so a 10^12-row corpus would
generate in parallel with no driver bottleneck, and re-running any partition
reproduces identical bytes.  Noise knobs (case flips, quote/dash swaps,
dot-after-initial junk, multi-line values, skew tail) mirror the reference's
matcher test axes (tests/annotation/simple_matching_annotator_test.py:283-399).
"""

from __future__ import annotations

import datetime
import random
from typing import Dict, Iterator, List, Optional
from xml.sax.saxutils import escape

WORDS = (
    "analysis cell protein gene model neural spark data method result "
    "study effect response signal network growth factor pathway binding "
    "structure dynamics sample measure spatial cluster random sequence "
    "align match corpus token stream batch shuffle partition vector "
    "science journal research experiment control group test case value"
).split()

SURNAMES = (
    "Smith Jones Maison Lee Garcia Chen Kumar Novak Rossi Dubois "
    "Tanaka Muller Silva Kim Olsen Haddad Petrov Costa Yamada Berg"
).split()

GIVEN_NAMES = (
    "John Mary Alexandra Wei Priya Anna Carlos Yuki Omar Ingrid "
    "Luca Fatima Peter Elena Ahmed Sofia David Nour Ivan Clara"
).split()

INSTITUTIONS = (
    "University of Science|Institute of Data Engineering|National Research Center"
    "|Laboratory of Applied Physics|College of Medicine|Center for Web Studies"
).split("|")

COUNTRIES = ["France", "Germany", "Japan", "Brazil", "United States", "Norway"]

LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)

# default xml-mapping config for the synthetic corpus (subset of the
# reference's config/xml-mapping.conf using the same suffix grammar)
DEFAULT_XML_MAPPING = """
[article]
title = front/article-meta/title-group/article-title
title.extend-to-line = false
abstract = front/article-meta/abstract
abstract.match-prefix-regex = (abstract|summary)\\s*$
abstract.max_chunks = 2
author = front/article-meta/contrib-group/contrib/name
author.children = .//*
author.match-multiple = true
author.merge = true
author_aff =
  front/article-meta/contrib-group/aff
  front/article-meta/contrib-group/contrib/aff
  front/article-meta/aff
author_aff.children = .//*
author_aff.unmatched-parent-text = true
author_aff.sub.author_aff-label = ./label
author_aff.sub.author_aff-institution = ./institution
author_aff.sub.author_aff-country = ./country
author_aff.alternative-spellings =
  United States=USA
author_aff.merge = false
author_aff.match-prefix-regex = ({author_aff-label})\\s*[\\.-]*\\s*$
keywords = front/article-meta/kwd-group
keywords.children = kwd
reference = back/ref-list/ref
reference.children = .//*
reference.sub.reference-title = .//article-title
reference.sub.reference-year = .//year
reference.sub.reference-source = .//source
reference.block = references
"""


def _phrase(rng: random.Random, n_words: int, capitalize: bool = False) -> str:
    words = [rng.choice(WORDS) for _ in range(n_words)]
    if capitalize:
        words = [w.capitalize() for w in words]
    return " ".join(words)


def _sentence(rng: random.Random) -> str:
    words = [rng.choice(WORDS) for _ in range(rng.randint(6, 14))]
    return " ".join(words).capitalize() + "."


def _noisify(rng: random.Random, text: str) -> str:
    """Document-side noise: the html shows a perturbed form of the target
    value; the matcher must still align it (fuzzy axes of the reference's
    matcher tests)."""
    roll = rng.random()
    if roll < 0.10:
        return text.upper()
    if roll < 0.20:
        return text.replace("'", '"')
    if roll < 0.27 and ", " in text:
        return text.replace(", ", " , ", 1)
    return text


def generate_document(
    seed: int, index: int, n_paragraphs_override: Optional[int] = None
) -> Dict[str, object]:
    """``n_paragraphs_override``: fixes the body length instead of the
    default 2-5 (+1% 50x tail) draw — the hook the skew-bench corpora use
    to impose a controlled size distribution (see
    :func:`sized_corpus_dataframe`).  ``None`` keeps the default corpus
    byte-identical (the override branch consumes the same rng draws)."""
    rng = random.Random((seed << 20) ^ index)
    n_authors = rng.randint(2, 4)
    authors = [(rng.choice(GIVEN_NAMES), rng.choice(SURNAMES)) for _ in range(n_authors)]
    n_affs = rng.randint(1, 2)
    affs = [
        (str(i + 1), rng.choice(INSTITUTIONS), rng.choice(COUNTRIES))
        for i in range(n_affs)
    ]
    title = _phrase(rng, rng.randint(4, 8), capitalize=True)
    abstract_sentences = [_sentence(rng) for _ in range(rng.randint(2, 4))]
    abstract = " ".join(abstract_sentences)
    keywords = [_phrase(rng, 1) for _ in range(rng.randint(2, 4))]
    n_refs = rng.randint(2, 5)
    references = [
        {
            "title": _phrase(rng, rng.randint(4, 7), capitalize=True),
            "author": "%s %s" % (rng.choice(GIVEN_NAMES), rng.choice(SURNAMES)),
            "source": _phrase(rng, 2, capitalize=True),
            "year": str(rng.randint(1990, 2024)),
        }
        for i in range(n_refs)
    ]
    # skew tail: ~1% of documents are 50x longer (giant-HTML skew axis)
    n_paragraphs = rng.randint(2, 5)
    if rng.random() < 0.01:
        n_paragraphs *= 50
    if n_paragraphs_override is not None:
        n_paragraphs = n_paragraphs_override
    body_paragraphs = [
        " ".join(_sentence(rng) for _ in range(rng.randint(2, 5)))
        for _ in range(n_paragraphs)
    ]

    # ---- document lines (what the html renders) ----
    author_line = ", ".join("%s %s" % (g, s) for g, s in authors)
    lines: List[str] = [_noisify(rng, title), author_line]
    for label, institution, country in affs:
        lines.append("%s %s, %s" % (label, _noisify(rng, institution), country))
    lines.append("Abstract")
    lines.extend(abstract_sentences)
    lines.append("Keywords: " + ", ".join(keywords))
    lines.extend(body_paragraphs)
    lines.append("References")
    for i, ref in enumerate(references):
        lines.append(
            "%d. %s. %s. %s. %s."
            % (i + 1, ref["author"], ref["title"], ref["source"], ref["year"])
        )

    # ---- html wrapping with boilerplate chrome ----
    # ~4% of documents get malformed markup (unclosed div, stray close tag,
    # unterminated paragraph) to exercise the recovery parser — the fixture
    # axis of the reference's FixingHtmlParser (utils/xml.py:163-250)
    malformed = rng.random() < 0.04
    if malformed:
        content_html = "<div><span>" + "".join(
            "<p>%s" % escape(line) for line in lines
        ) + "</b>"
    else:
        content_html = "".join("<p>%s</p>" % escape(line) for line in lines)
    html = (
        "<html><head><title>%s</title><style>p{margin:0}</style>"
        "<script>var x=1;</script></head>"
        "<body><nav>Home | About | <a href='/'>Search</a></nav>"
        "<header>Site Header %d</header>"
        "<div id='content'>%s</div>"
        "<footer>Copyright 2024 Example Org</footer></body></html>"
        % (escape(title), index, content_html)
    )

    # ---- target JATS xml ----
    contribs = "".join(
        "<contrib contrib-type=\"author\"><name>"
        "<surname>%s</surname><given-names>%s</given-names></name></contrib>"
        % (escape(s), escape(g))
        for g, s in authors
    )
    affs_xml = "".join(
        "<aff><label>%s</label><institution>%s</institution><country>%s</country></aff>"
        % (escape(label), escape(inst), escape(country))
        for label, inst, country in affs
    )
    kwd_xml = "<kwd-group>%s</kwd-group>" % "".join(
        "<kwd>%s</kwd>" % escape(k) for k in keywords
    )
    refs_xml = "<ref-list>%s</ref-list>" % "".join(
        "<ref><element-citation>"
        "<string-name>%s</string-name><article-title>%s</article-title>"
        "<source>%s</source><year>%s</year>"
        "</element-citation></ref>"
        % (escape(r["author"]), escape(r["title"]), escape(r["source"]), escape(r["year"]))
        for r in references
    )
    target_xml = (
        "<article><front><article-meta>"
        "<title-group><article-title>%s</article-title></title-group>"
        "<contrib-group>%s</contrib-group>%s"
        "<abstract>%s</abstract>%s"
        "</article-meta></front>"
        "<back>%s</back></article>"
        % (escape(title), contribs, affs_xml, escape(abstract), kwd_xml, refs_xml)
    )

    return {
        "url": "https://example.org/article/%08d" % index,
        "warc_ts": BASE_TS + datetime.timedelta(seconds=index * 7),
        "html": html.encode("utf-8"),
        "text": "\n".join(lines),
        "lang": LANGS[index % len(LANGS)],
        "target_xml": target_xml,
    }


def generate_documents(seed: int, indices) -> Iterator[Dict[str, object]]:
    for index in indices:
        yield generate_document(seed, int(index))


CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "target_xml string"
)


def corpus_dataframe(spark, n_docs: int, seed: int = 42, partitions: Optional[int] = None):
    """Distributed deterministic generation: one task per id-range partition.

    At real scale this is the ingest job writing the Iceberg ``documents``
    table; here it feeds tests and benchmarks directly.
    """
    import pandas as pd  # local import: keep module importable without pandas

    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)

    def generate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = list(generate_documents(seed, pdf["id"].tolist()))
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(generate_batches, schema=CORPUS_SCHEMA)
    )


def pareto_paragraph_counts(
    n_docs: int,
    seed: int = 42,
    alpha: float = 1.2,
    cap: float = 300.0,
    base_paragraphs: int = 3,
) -> List[int]:
    """Deterministic heavy-tailed per-document body sizes: paragraph count
    ``round(base * min(cap, (1-u)^(-1/alpha)))`` with u ~ seeded uniform —
    a Pareto(alpha) size distribution capped at ``cap`` x base (default
    ~250x the median document, i.e. giants well under the oversized-doc
    guard threshold but hundreds of times the typical kernel cost)."""
    rng = random.Random((seed << 22) ^ 0x5EED)
    counts = []
    for _ in range(n_docs):
        u = rng.random()
        mult = min(cap, (1.0 - u) ** (-1.0 / alpha))
        counts.append(max(1, int(round(base_paragraphs * mult))))
    return counts


def uniform_paragraph_counts(n_docs: int, total_paragraphs: int) -> List[int]:
    """Per-document sizes for the EQUAL-TOTAL-BYTES uniform control corpus:
    the same paragraph budget as a skewed corpus, spread evenly (the first
    ``total % n`` documents take the remainder)."""
    base, rem = divmod(total_paragraphs, n_docs)
    return [base + (1 if i < rem else 0) for i in range(n_docs)]


def sized_corpus_dataframe(
    spark,
    paragraph_counts: List[int],
    seed: int = 42,
    partitions: Optional[int] = None,
):
    """Corpus with an imposed per-document body-size distribution
    (``paragraph_counts[i]`` body paragraphs for document i) — the
    skew-bench input builder.  Counts ride to executors inside the task
    closure (one int per document; for a 10^12-row table the counts would
    instead be a column computed from (seed, id) like everything else)."""
    import pandas as pd

    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)
    n_docs = len(paragraph_counts)

    def generate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                generate_document(
                    seed, int(i), n_paragraphs_override=paragraph_counts[int(i)]
                )
                for i in pdf["id"].tolist()
            ]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(generate_batches, schema=CORPUS_SCHEMA)
    )
