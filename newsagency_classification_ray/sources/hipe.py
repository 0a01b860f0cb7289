"""HIPE CoNLL TSV source (SURVEY.md §2.1 S7) + doc-level rollups (A6).

The reference's gold corpora are 13-column CoNLL-style TSVs with per-document
``# key = value`` metadata comment lines and sentence boundaries marked by
blank lines or an ``EndOfSentence`` flag in the SEG column
(``lib/bert_classification/dataset.py:4-118``; written by
``convert_xmi2clef_format.py:417-442``; column list ``dataset.py:4-16``).
``read_csv`` cannot carry the comment-line metadata onto the token rows, so
the reader is file-atomic: one parse task per file (files are small annotation
corpora; parallelism = #files), emitting one Arrow row per token with the doc
metadata denormalized onto it — the columnar re-expression of the reference's
comment-line regime (FIXTURES.md F4).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data import Dataset

HIPE_COLUMNS = [
    "TOKEN", "NE-COARSE-LIT", "NE-COARSE-METO", "NE-FINE-LIT", "NE-FINE-METO",
    "NE-FINE-COMP", "NE-NESTED", "NEL-LIT", "NEL-METO", "RENDER", "SEG",
    "OCR-INFO", "MISC",
]  # reference dataset.py:4-16

_META_KEYS = ("language", "newspaper", "date", "document_id")

TOKENS_SCHEMA = pa.schema(
    [
        ("document_id", pa.string()),
        ("language", pa.string()),
        ("newspaper", pa.string()),
        ("date", pa.string()),
        ("seg_idx", pa.int32()),    # sentence index within the document
        ("tok_idx", pa.int32()),    # token index within the sentence
        # physical-layout segment: increments on '# segment…' comment lines —
        # the scope the HIPE scorer matches fuzzy regimes within
        # (HIPE-scorer/hipe_evaluation/utils.py:140-143 segments on
        # '# segment', NOT on blank lines or EndOfSentence)
        ("scorer_seg_idx", pa.int32()),
        ("token", pa.string()),
    ]
    + [(c.lower().replace("-", "_"), pa.string()) for c in HIPE_COLUMNS[1:]]
)


def parse_hipe_text(text: str) -> pa.Table:
    """Parse one HIPE TSV file's content → token rows (pure function).

    Reference parse semantics (``dataset.py:19-118``): ``#`` lines carry doc
    metadata (``# key = value``); a blank line or an ``EndOfSentence`` flag in
    SEG closes the current sentence; metadata resets apply to following rows.
    """
    cols: dict[str, list] = {name: [] for name in TOKENS_SCHEMA.names}
    meta = {k: None for k in _META_KEYS}
    seg_idx = 0
    tok_idx = 0
    scorer_seg = 0
    toks_in_scorer_seg = 0
    doc_seen: dict[str, int] = {}
    ncols = len(HIPE_COLUMNS)
    for line in text.splitlines():
        if not line.strip():
            if tok_idx:
                seg_idx += 1
                tok_idx = 0
            continue
        if line.startswith("#"):
            # scorer segmentation: '# segment…' closes the current physical
            # segment iff it holds tokens (utils.py:140-143); '# document…'
            # closes segment + document
            if line.startswith("# segment") and toks_in_scorer_seg:
                scorer_seg += 1
                toks_in_scorer_seg = 0
            body = line.lstrip("# ").strip()
            if "=" in body:
                key, _, val = body.partition("=")
                key = key.strip()
                if key in _META_KEYS:
                    if key == "document_id":
                        # new document → reset sentence numbering
                        seg_idx = 0
                        tok_idx = 0
                        scorer_seg = 0
                        toks_in_scorer_seg = 0
                        # the fr test set repeats 7 articles verbatim
                        # (reference README.md:86); the scorer treats each
                        # occurrence as a separate document — uniquify so a
                        # doc-keyed groupby never interleaves the copies
                        v = val.strip()
                        n = doc_seen.get(v, 0)
                        doc_seen[v] = n + 1
                        meta[key] = v if n == 0 else f"{v}#dup{n}"
                        continue
                    meta[key] = val.strip()
            continue
        fields = line.split("\t")
        if len(fields) < ncols:
            fields = fields + [""] * (ncols - len(fields))
        cols["document_id"].append(meta["document_id"])
        cols["language"].append(meta["language"])
        cols["newspaper"].append(meta["newspaper"])
        cols["date"].append(meta["date"])
        cols["seg_idx"].append(seg_idx)
        cols["tok_idx"].append(tok_idx)
        cols["scorer_seg_idx"].append(scorer_seg)
        cols["token"].append(fields[0])
        for name, val in zip(HIPE_COLUMNS[1:], fields[1:ncols]):
            cols[name.lower().replace("-", "_")].append(val)
        tok_idx += 1
        toks_in_scorer_seg += 1
        if "EndOfSentence" in fields[10]:  # SEG column, dataset.py:59-99
            seg_idx += 1
            tok_idx = 0
    return pa.Table.from_pydict(cols, schema=TOKENS_SCHEMA)


def read_hipe_tsv(paths: str | list[str]) -> Dataset:
    """TSV file(s) → token-row Dataset (one parse task per file)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_hipe_text(b.decode("utf-8"))
            for b in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else parse_hipe_text("")

    return files.map_batches(parse, batch_format="pyarrow")


def token_spans(tokens: Dataset, col: str = "ne_fine_lit",
                with_seg: bool = False) -> Dataset:
    """IOB token rows → entity spans keyed by global token position.

    Emits (document_id, l, r, label) per entity, where l/r are token indices
    in document order (seg_idx, tok_idx) — the span form our scorer consumes.
    ``with_seg=True`` adds the *scorer segment* of the span's first token —
    the '# segment…'-delimited physical region the reference scorer matches
    its fuzzy regimes within (it zips gold/pred segments; spans never cross
    a segment in this data, so the start token's segment is the span's). Tag normalization matches the tagger
    decode: ``S-→B-``, ``E-→I-``, ``_``/``-``/empty → O (reference
    ``cli_tagger_no_torch_serve.py:164-205``). Feeding the reference's own
    gold + prediction TSVs through this and ``eval.strict_span_prf``
    reproduces the reference scorer's published strict micro numbers
    bit-exactly (see tests/test_reference_scorer_parity).
    """
    import numpy as np

    def per_doc(g: pa.Table) -> pa.Table:
        seg = g["seg_idx"].to_numpy(zero_copy_only=False)
        tok = g["tok_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, seg))
        labels = np.asarray(g[col].to_pylist(), dtype=object)[order]
        seg_src = ("scorer_seg_idx" if "scorer_seg_idx" in g.column_names
                   else "seg_idx")  # synthetic token tables may omit it
        seg_sorted = g[seg_src].to_numpy(zero_copy_only=False)[order]
        doc = g["document_id"][0].as_py()
        out_l, out_r, out_lab, out_seg = [], [], [], []
        cur = None
        start = -1
        for i, raw in enumerate(list(labels) + ["O"]):
            tag = raw or "O"
            tag = "O" if tag in ("_", "-", "") else tag
            tag = tag.replace("S-", "B-").replace("E-", "I-")
            if tag == "O":
                if cur is not None:
                    out_l.append(start); out_r.append(i); out_lab.append(cur)
                    out_seg.append(int(seg_sorted[start]))
                    cur = None
                continue
            pre, _, lab = tag.partition("-")
            if pre == "B" or cur != lab:
                if cur is not None:
                    out_l.append(start); out_r.append(i); out_lab.append(cur)
                    out_seg.append(int(seg_sorted[start]))
                cur = lab
                start = i
        cols = {
            "document_id": pa.array([doc] * len(out_l), type=pa.string()),
            "l": pa.array(out_l, type=pa.int64()),
            "r": pa.array(out_r, type=pa.int64()),
            "label": pa.array([s.upper() for s in out_lab], type=pa.string()),
        }
        if with_seg:
            cols["seg"] = pa.array(out_seg, type=pa.int64())
        return pa.table(cols)

    return tokens.groupby("document_id").map_groups(per_doc, batch_format="pyarrow")


def merge_predictions(tokens: Dataset, preds: Dataset,
                      num_partitions: int | None = None) -> Dataset:
    """S8: merge predicted labels back into the gold token table.

    The reference zips flattened predicted labels positionally against the
    gold TSV lines (``utils.py:81-127``; fragile — SURVEY.md §2.4 J4); here
    both sides carry the explicit key (document_id, seg_idx, tok_idx) and
    meet in a left-outer hash join. Tokens without a prediction (e.g. beyond
    the truncation window) get ``'O'`` — the reference's truncation labeling
    (``cli_tagger_no_torch_serve.py:219-224``). The coarse label is derived
    from the fine one (``fine.split('.')[0]``, ``utils.py:107-112``).

    ``preds`` schema: (document_id, seg_idx, tok_idx, pred_fine).
    """
    import pyarrow.compute as pc
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(16, cpus // 4))

    joined = tokens.join(
        preds, "left_outer", num_partitions,
        on=("document_id", "seg_idx", "tok_idx"),
    )

    def finish(t: pa.Table) -> pa.Table:
        fine = pc.fill_null(pc.cast(t["pred_fine"], pa.string()), "O")
        # coarse = fine.split('.')[0] with the B-/I- prefix preserved
        coarse = pc.replace_substring_regex(fine, pattern=r"^((?:[BI]-)?[^.]*)\..*$",
                                            replacement=r"\1")
        out = t.drop_columns(["pred_fine"])
        return out.append_column("pred_fine", fine).append_column("pred_coarse", coarse)

    return joined.map_batches(finish, batch_format="pyarrow")


def format_pred_tsv(gold_text: str, pred_fine: dict[tuple, str]) -> str:
    """Render predictions in the reference's pred-TSV layout (S8 writer,
    ``lib/bert_classification/utils.py:81-127``): comment/blank/short lines
    copied verbatim; every token line becomes ``TOKEN \\t coarse \\t O \\t
    fine \\t <original columns 4+>`` where ``coarse = fine.split('.')[0]``
    when the prediction carries a B-/I- prefix, else ``'O'``.

    ``pred_fine`` maps (document_id, seg_idx, tok_idx) — the same keys
    :func:`parse_hipe_text` emits, including the duplicate-document
    uniquification — to the fine IOB label; missing keys (e.g. tokens
    beyond the truncation window) render ``'O'``
    (``cli_tagger_no_torch_serve.py:219-224``). Byte-identical round trip
    against the reference's own shipped pred files is pinned in
    tests/test_hipe.py.
    """
    ncols = len(HIPE_COLUMNS)
    out: list[str] = []
    seg = tok = 0
    doc: str | None = None
    doc_seen: dict[str, int] = {}
    for i, line in enumerate(gold_text.splitlines(keepends=True)):
        stripped = line.rstrip("\r\n")
        fields = stripped.split("\t")
        if i == 0 or len(fields) != ncols or not stripped.strip():
            # verbatim copy (reference utils.py:98-104) — but counters still
            # advance exactly like parse_hipe_text so keys stay aligned
            if not stripped.strip():
                if tok:
                    seg += 1
                    tok = 0
            elif stripped.startswith("#"):
                body = stripped.lstrip("# ").strip()
                if "=" in body:
                    key, _, val = body.partition("=")
                    if key.strip() == "document_id":
                        seg = tok = 0
                        v = val.strip()
                        n = doc_seen.get(v, 0)
                        doc_seen[v] = n + 1
                        doc = v if n == 0 else f"{v}#dup{n}"
            out.append(line)
            continue
        fine = pred_fine.get((doc, seg, tok), "O") or "O"
        coarse = fine.split(".")[0] if "-" in fine else "O"
        newline = line[len(stripped):]
        out.append(
            f"{fields[0]}\t{coarse}\tO\t{fine}\t" + "\t".join(fields[4:]) + newline
        )
        tok += 1
        if "EndOfSentence" in fields[10]:
            seg += 1
            tok = 0
    return "".join(out)


def write_pred_tsv(preds: Dataset, gold_path: str, out_path: str,
                   fine_col: str = "pred_fine") -> None:
    """Materialize a predictions Dataset as a reference-layout pred TSV for
    one gold file, so the *vendored* reference scorer can consume the
    engine's predictions unchanged. Annotation corpora are small (the scale
    axis is #files — one writer task per file); the per-file lookup is a
    driver-side dict."""
    lookup = {
        (r["document_id"], r["seg_idx"], r["tok_idx"]): r[fine_col]
        for r in preds.select_columns(
            ["document_id", "seg_idx", "tok_idx", fine_col]
        ).take_all()
    }
    with open(gold_path, encoding="utf-8") as f:
        gold_text = f.read()
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(format_pred_tsv(gold_text, lookup))


def doc_agency_labels(tokens: Dataset) -> Dataset:
    """Per-document set of linked agency QIDs — the reference's
    ``news-agency-as-source`` doc summary (A6,
    ``convert_xmi2clef_format.py:395-409``): distinct non-null NEL-LIT values
    per document, sorted and comma-joined for a stable scalar column."""
    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.invert(pc.is_in(t["nel_lit"], value_set=pa.array(["", "_", "-"]))),
            pc.is_valid(t["nel_lit"]),
        )
        return t.filter(mask).select(["document_id", "nel_lit"])

    def rollup(g: pa.Table) -> pa.Table:
        qids = sorted(set(g["nel_lit"].to_pylist()))
        return pa.table({
            "document_id": pa.array([g["document_id"][0].as_py()], type=pa.string()),
            "agencies": pa.array([",".join(qids)], type=pa.string()),
            "n_agencies": pa.array([len(qids)], type=pa.int64()),
        })

    # per-batch local dedup (combiner) before the per-doc group
    local = tokens.map_batches(project, batch_format="pyarrow").map_batches(
        lambda t: t.group_by(["document_id", "nel_lit"]).aggregate([]),
        batch_format="pyarrow",
    )
    return local.groupby("document_id").map_groups(rollup, batch_format="pyarrow")
