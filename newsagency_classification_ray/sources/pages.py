"""Deterministic synthetic `pages` table (flagship input, BASELINE.json input_hint).

Schema: ``(url: string, warc_ts: timestamp[us], html: binary,
text: large_string, lang: string)`` — the Common-Crawl-style analogue of the
reference's content-item JSONL (``cli_tagger.py:278-283``;
``tests/na_tagger_in.jsonl``). Synthesis is seeded, offline, and *per-index
deterministic* (page ``i`` of a corpus of size ``n`` is a pure function of
``(seed, i)``), so any scale can be regenerated reproducibly and the DuckDB
oracle can read the identical parquet file.

Corpus properties (mirroring FIXTURES.md F1 and reference README.md:96-114):

* ~12 % of pages embed 1–3 agency mentions (reference finding: ~10 % of
  articles cite an agency, README.md:21); agency choice is Zipfian so
  Reuters/Havas dominate — the head-key skew the canonicalization shuffle must
  defuse with salting (SURVEY.md §2.5 A2).
* Mentions are injected as dateline / attribution sentences using alias
  surface forms incl. OCR-noisy variants (``Havaas`` → ``Havas`` per the
  golden fixture ``tests/na_tagger_out.jsonl``). Injected aliases are single
  word-char tokens so the DuckDB oracle can re-find them with ``\\b…\\b``
  regexes.
* ``lang`` ∈ {fr, de, en, lb}; only fr/de pass the language gate
  (``cli_tagger.py:130-132``) — en/lb pages (even with mentions) must yield
  nothing.
* ~20 % of rows carry ``html`` only (``text`` null) → the extractor must
  reproduce the text byte-identically; ~10 % carry both; rest text-only.
* Adversarial rows: empty text, punctuation-only text, over-long single
  sentences whose only alias sits beyond the 512-token truncation window
  (slug prefix ``long`` — reference truncation semantics
  ``cli_tagger_no_torch_serve.py:219-224``), and exact duplicate urls
  (exact-dedup motivation: reference README.md:86).
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.html import wrap_html
from ..vocab import ALIAS_VARIANTS

SEED = 42

# Aliases the *generator* injects: single tokens of word chars only (keeps the
# SQL oracle regex exact); dotted / trailing-dot variants stay linker-only.
GEN_ALIASES: dict[str, list[str]] = {
    canon: [a for a in aliases if a.replace("-", "").isalnum() and "-" not in a]
    for canon, aliases in ALIAS_VARIANTS.items()
}
GEN_ALIASES = {c: v for c, v in GEN_ALIASES.items() if v}

# Zipfian agency ranking — Reuters/Havas head (reference README.md:88-90).
_AGENCY_RANKED = [
    "Reuters", "Havas", "AFP", "Wolff", "Stefani", "ATS-SDA", "AP", "TASS",
    "DNB", "UP-UPI", "Belga", "ANSA", "DPA", "Extel", "Domei", "Europapress",
    "APA", "ANP", "BTA", "CTK", "DDP-DAPD", "Interfax", "Kipa", "PAP",
    "SPK-SMP", "TANJUG", "Telunion", "TT", "Xinhua",
]
_AGENCY_RANKED = [a for a in _AGENCY_RANKED if a in GEN_ALIASES]
_AGENCY_WEIGHTS = [1.0 / (r + 1) ** 1.2 for r in range(len(_AGENCY_RANKED))]

_HOSTS = [f"news{k}.example.{tld}" for k in range(10) for tld in ("ch", "lu")]
_LANGS = ["fr", "de", "en", "lb"]
_LANG_W = [0.40, 0.30, 0.20, 0.10]
_CITIES = ["LONDRES", "PARIS", "BERNE", "ZURICH", "MILAN", "VIENNE", "BERLIN", "ROME"]

# filler vocabulary — lowercase, disjoint from every alias surface
_WORDS = (
    "le la les de des du et dans sur avec pour par une un au aux ce cette "
    "gouvernement conseil canton ville pays marche commerce industrie "
    "politique guerre paix traite accord loi projet peuple nation etat "
    "ministre president armee train ligne route nouvelle journal presse "
    "der die das und in auf mit fur durch eine ein zum zur bericht "
    "regierung kanton stadt land markt handel politik krieg friede vertrag "
    "gesetz volk staat minister zeitung presse bahn strasse neue"
).split()

_TEMPLATES = ("dateline", "attribution", "parenthetical")


def _sentence(rng: random.Random, nwords: int | None = None) -> str:
    n = nwords or rng.randint(6, 12)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    return (ws[0].capitalize() + " " + " ".join(ws[1:]) + ".") if n > 1 else ws[0].capitalize() + "."


def _mention_sentence(rng: random.Random) -> str:
    canon = rng.choices(_AGENCY_RANKED, weights=_AGENCY_WEIGHTS, k=1)[0]
    alias = rng.choice(GEN_ALIASES[canon])
    kind = rng.choice(_TEMPLATES)
    if kind == "dateline":
        return f"{rng.choice(_CITIES)}, {rng.randint(1, 28)} ({alias})."
    if kind == "attribution":
        body = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 8)))
        return f"Selon une depeche de {alias}, {body}."
    body = _sentence(rng)
    return body[:-1] + f" ({alias})."


def gen_page(i: int, seed: int = SEED) -> dict:
    """Pure function (seed, i) → one page row."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))
    if i > 0 and i % 997 == 0:
        # exact duplicate of the previous page (duplicate-url adversarial row)
        return gen_page(i - 1, seed)

    host = rng.choice(_HOSTS)
    lang = rng.choices(_LANGS, weights=_LANG_W, k=1)[0]
    year = rng.randint(1940, 1999)
    month, day = rng.randint(1, 12), rng.randint(1, 28)
    hour, minute = rng.randint(0, 23), rng.randint(0, 59)
    ts = datetime.datetime(year, month, day, hour, minute, 0)

    slug = "article"
    if i % 611 == 0:
        text = ""
    elif i % 613 == 0:
        text = "!!! ??? ... ;;; ---"
    elif i % 617 == 0:
        # over-long single sentence; its only alias lands past 512 tokens →
        # truncation drops it (cli_tagger_no_torch_serve.py:219-224)
        slug = "long"
        ws = [rng.choice(_WORDS) for _ in range(560)]
        ws.append("(Havas)")
        ws.extend(rng.choice(_WORDS) for _ in range(20))
        text = " ".join(ws) + "."
    else:
        nsent = rng.randint(2, 7)
        sents = [_sentence(rng) for _ in range(nsent)]
        if rng.random() < 0.12:
            for _ in range(rng.randint(1, 3)):
                sents.insert(rng.randrange(len(sents) + 1), _mention_sentence(rng))
        text = " ".join(sents)

    url = f"https://{host}/{year:04d}/{month:02d}/{day:02d}/{slug}-{i}"
    form = rng.random()
    if form < 0.20:
        html, out_text = wrap_html(text, title=f"page {i}"), None   # extractor path
    elif form < 0.30:
        html, out_text = wrap_html(text, title=f"page {i}"), text   # both
    else:
        html, out_text = None, text                                  # text only
    return {"url": url, "warc_ts": ts, "html": html, "text": out_text, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def gen_pages_table(n: int, seed: int = SEED, start: int = 0) -> pa.Table:
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_count_for_sf(sf: float) -> int:
    """Corpus size per scale factor: sf0.001→2k, sf0.01→20k, sf0.1→200k pages."""
    return max(500, int(round(2_000_000 * sf)))


def sf_of_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    return float(base.removeprefix("sf")) if base.startswith("sf") else 0.001


NUM_SHARDS = 16


def pages_path_for(sf_dir: str, cache_root: str = "/tmp/nacr_pages",
                   mult: int = 1) -> str:
    n = pages_count_for_sf(sf_of_dir(sf_dir)) * mult
    return os.path.join(cache_root, f"pages_n{n}_seed{SEED}")


def ensure_pages(sf_dir: str, cache_root: str = "/tmp/nacr_pages",
                 mult: int = 1) -> str:
    """Write (once) and return the parquet *directory* of the pages corpus.

    Written as ``NUM_SHARDS`` deterministic shard files — the real input is
    many crawl shards, and a single file makes the Ray read a single task
    (measured: a serial ~3 s head on the sf0.1 pipeline). Shard k holds the
    contiguous index range [k·n/S, (k+1)·n/S); rows are a pure function of
    (seed, index) so the corpus is identical at any sharding.
    """
    path = pages_path_for(sf_dir, cache_root, mult)
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    n = pages_count_for_sf(sf_of_dir(sf_dir)) * mult
    tmp = path + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(tmp)
    bounds = [n * k // NUM_SHARDS for k in range(NUM_SHARDS + 1)]
    chunk = 20_000
    for k in range(NUM_SHARDS):
        lo, hi = bounds[k], bounds[k + 1]
        writer = pq.ParquetWriter(
            os.path.join(tmp, f"shard-{k:05d}.parquet"), PAGES_SCHEMA
        )
        for start in range(lo, hi, chunk):
            writer.write_table(gen_pages_table(min(chunk, hi - start), start=start))
        writer.close()
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    os.replace(tmp, path)  # atomic publish
    return path
