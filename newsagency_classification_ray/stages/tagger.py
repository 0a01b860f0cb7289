"""Tagger stage (T1): sentence-segment → tokenize → token-classify → BIO decode.

Actor-pool stage: pass the class to
``ds.map_batches(TaggerStage, concurrency=N, batch_size=B,
batch_format="pyarrow")``. All per-actor state (compiled regexes, the alias
model, and — when available — a real HF token-classification model) is built
once in ``__init__`` and reused across batches, the Ray-native replacement for
the reference's external TorchServe model server
(``model_handler.py:96-175``), whose single-server funnel is exactly what
killed its 8-worker scaling (SURVEY.md §4: 2.2× instead of 10×). Here every
actor holds its own model replica co-located with the data.

Model backends
--------------
* ``AliasModel`` (default in this sandbox — no torch/transformers installed):
  a deterministic token classifier over the agency alias lexicon, the same
  surrogate the reference's own golden fixture uses (``sys_id`` is literally
  ``"ALIAS BERT MODEL"`` in ``tests/na_tagger_out.jsonl``). Per-token dict
  lookup; emits fine IOB labels ``B-org.ent.pressagency.{Agency}``.
* ``BertModel`` (gated behind an import-try): loads the reference's
  fine-tuned ``dbmdz/bert-base-historic`` checkpoints via transformers and
  reproduces the reference's realign semantics
  (``cli_tagger_no_torch_serve.py:208-226``): first-wordpiece prediction per
  word, words beyond ``max_length`` → ``'O'``. Raises ``NotImplementedError``
  when torch is unavailable.

Batched inference (the reference's documented bottleneck, fixed)
----------------------------------------------------------------
The reference runs the model at batch size 1 — one forward per sentence
(``cli_tagger_no_torch_serve.py:298``), which its own timing files show is
>99 % of wall-time. Every backend here exposes
``tag_batch(list_of_token_lists) -> list[(tags, confs)]``: the stage
collects ALL gated sentences of an Arrow batch first, then the model runs
ONE padded forward per length-sorted chunk (length bucketing keeps padding
waste minimal). Per-sentence ``tag`` remains for tests/tools; the hot path
is ``tag_batch``.

Reference decode parity: sentence-local offsets are exact span arithmetic
(vs the reference's ``sentence.find(surface)`` first-occurrence bias,
``cli_tagger.py:177-187`` — ours is correct on repeated surfaces and equal
otherwise); article offsets are ``sentence_span.start + sentence_offset``
(equal to the reference's cumulative ``len(sentence)+1`` accounting,
``cli_tagger.py:227``, on single-space-separated text and still exact
otherwise). Mention filters: drop ``'O'``, pure punctuation, ``len<=1``
(``cli_tagger.py:163-165``). ``ATB→ATS`` typo fix (``cli_tagger.py:191-199``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ids import mention_id
from ..functions.textproc import (
    Span,
    decode_bio,
    is_punct_only,
    segment_sentences,
    tokenize_with_spans,
)
from ..vocab import ALIAS_TO_CANONICAL, FINE_LABEL_PREFIX, qid_for_label

MAX_TOKENS_PER_SENTENCE = 512  # reference max_length (cli_tagger_no_torch_serve.py:255,293)

MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("entity", pa.string()),        # fine label, e.g. org.ent.pressagency.Havas
        ("surface", pa.string()),
        ("qid", pa.string()),           # dict-EL result (M12); LinkerStage refines
        ("sentence_idx", pa.int32()),
        ("l_sent", pa.int64()),
        ("r_sent", pa.int64()),
        ("l_art", pa.int64()),
        ("r_art", pa.int64()),
        ("confidence", pa.float32()),
        ("mention_id", pa.string()),
    ]
)


class AliasModel:
    """Deterministic per-sentence token classifier over the alias lexicon.

    ``tag(tokens) -> (tags, confidences)`` where tags are IOB fine labels.
    Tokens beyond ``max_tokens`` are labeled ``'O'`` — the reference's
    silent per-sentence truncation (cli_tagger_no_torch_serve.py:219-224).
    """

    sys_id = "ALIAS BERT MODEL"  # reference tests/na_tagger_out.jsonl sys_id

    def __init__(self, max_tokens: int = MAX_TOKENS_PER_SENTENCE):
        import re

        self.max_tokens = max_tokens
        self.lexicon = ALIAS_TO_CANONICAL  # surface -> canonical agency
        # Candidate pre-gate: a token can only match the lexicon if the raw
        # text contains that alias as a substring, so one compiled alternation
        # scan is a sound superset test (no false negatives; a false positive
        # just takes the full segment+tokenize+tag path). Prunes the ~85 % of
        # articles/sentences with no alias at C speed — the surrogate's
        # stand-in for batching cheap "no entity here" rejections before the
        # expensive model forward.
        self._gate = re.compile(
            "|".join(re.escape(a) for a in sorted(self.lexicon, key=len, reverse=True))
        )

    def has_candidates(self, text: str) -> bool:
        return self._gate.search(text) is not None

    def tag(self, tokens: list[Span]) -> tuple[list[str], list[float]]:
        tags = ["O"] * len(tokens)
        confs = [0.0] * len(tokens)
        lex = self.lexicon
        for i, tok in enumerate(tokens):
            if i >= self.max_tokens:
                break
            canon = lex.get(tok.text)
            if canon is not None:
                tags[i] = "B-" + FINE_LABEL_PREFIX + canon
                confs[i] = 0.99 if tok.text == canon else 0.95
        return tags, confs

    def tag_batch(
        self, token_lists: list[list[Span]]
    ) -> list[tuple[list[str], list[float]]]:
        """Batched entry point. The alias surrogate is dict lookups — no
        forward to batch — so this is a plain loop; compute-bound backends
        override it with a padded multi-sentence forward."""
        return [self.tag(toks) for toks in token_lists]


class SimulatedBertModel(AliasModel):
    """AliasModel outputs + a BERT-shaped compute load (scaling benchmark).

    The north-star job is token-classification-inference-bound (reference
    timing files: model forward ≈ 99 % of batch wall-time, SURVEY.md §6), but
    the alias surrogate with its candidate pre-gate is ~10³× lighter than
    BERT, so a scaling run against it measures Ray overhead instead of the
    production regime. This backend keeps outputs byte-identical to
    :class:`AliasModel` while running a deterministic dense forward per
    sentence (seq×256 @ 256×256, twice — ~1 ms/sentence at seq≈60, scaling
    with token count like a real transformer layer) and disabling the
    lexicon gate (BERT sees every sentence). Used by ``bench.py --scaling``.
    """

    sys_id = "SIM BERT MODEL"
    has_candidates = None  # no pre-gate: every sentence pays the forward
    # padded-row budget per forward: ~2k×hidden float32 keeps both GEMM
    # operands cache-resident (measured sweep: 1.3-2.5k rows is the knee;
    # one giant flat GEMM goes memory-bound and is 4× slower)
    chunk_rows = 2048

    def __init__(self, max_tokens: int = MAX_TOKENS_PER_SENTENCE,
                 hidden: int = 384, layers: int = 6):
        """``layers`` calibrates the surrogate's per-token cost so that
        inference stays the dominant share of wall-time, matching the
        reference's measured profile (model ≈ 99 % of batch wall,
        ``data/timings/batch_timings.json``). Batched inference made one
        layer pair ~4× cheaper end-to-end, which would let sandbox fixed
        costs dominate the scaling measurement; 6 layer pairs ≈ 3.5
        MFLOP/token is still ~8× lighter than real BERT-base but keeps the
        benchmark in the model-bound regime the metric targets."""
        super().__init__(max_tokens)
        import numpy as np

        rng = np.random.RandomState(1234)
        self._w1 = rng.randn(hidden, hidden).astype(np.float32)
        self._w2 = rng.randn(hidden, hidden).astype(np.float32)
        self._hidden = hidden
        self._layers = layers
        self._np = np

    def tag(self, tokens: list[Span]) -> tuple[list[str], list[float]]:
        np = self._np
        # padded sequence floor of 64, like real padded batch inference
        # (the reference runs max_length 512 at batch size 1,
        # cli_tagger_no_torch_serve.py:255,293 — far heavier than this)
        seq = max(64, min(len(tokens), self.max_tokens))
        x = np.ones((seq, self._hidden), dtype=np.float32)
        for _ in range(self._layers):
            x = np.tanh(x @ self._w1) @ self._w2  # the simulated forward
        _ = float(x[0, 0])  # keep the computation observable
        return super().tag(tokens)

    def tag_batch(
        self, token_lists: list[list[Span]]
    ) -> list[tuple[list[str], list[float]]]:
        """ONE padded forward per length-sorted chunk (vs the reference's
        per-sentence batch-size-1 forward, cli_tagger_no_torch_serve.py:298).

        Length bucketing: sentences are sorted by token count before
        chunking, so each chunk pads to ≈ its own max length instead of the
        global one — the standard padded-batch-inference layout. Outputs are
        byte-identical to :class:`AliasModel` (the forward is the compute
        load; the labels come from the deterministic lexicon scan).
        """
        np = self._np
        n = len(token_lists)
        order = sorted(range(n), key=lambda i: len(token_lists[i]))
        # chunk by padded-row budget: length-sorted sentences pack until
        # n_sentences × chunk-max-seq hits chunk_rows, then one flat
        # (rows, hidden) GEMM covers the whole chunk
        pos = 0
        while pos < n:
            # pad to the chunk's own max length — no per-sentence floor-64
            # (the floor in :meth:`tag` models batch-1 kernel overhead,
            # which is precisely what batching amortizes away)
            seq = 8
            end = pos
            while end < n:
                cand = max(seq, min(len(token_lists[order[end]]), self.max_tokens))
                if (end - pos + 1) * cand > self.chunk_rows and end > pos:
                    break
                seq = cand
                end += 1
            x = np.ones(((end - pos) * seq, self._hidden), dtype=np.float32)
            for _ in range(self._layers):
                x = np.tanh(x @ self._w1) @ self._w2  # one forward per chunk
            _ = float(x[0, 0])
            pos = end
        lex_tag = AliasModel.tag
        return [lex_tag(self, toks) for toks in token_lists]


def realign_wordpieces(
    word_ids: list,
    pred_ids: list,
    confidences: list,
    n_words: int,
    id2label: dict,
) -> tuple[list[str], list[float]]:
    """Subword → word realignment (M5), pure and torch-free.

    Reference semantics (``cli_tagger_no_torch_serve.py:208-226``): the
    prediction of the FIRST wordpiece of each word is the word's tag;
    special/padding positions carry ``word_id None``; words whose first
    wordpiece was truncated beyond ``max_length`` never appear in
    ``word_ids`` and silently stay ``'O'``. Factored out of the torch path
    so the realign logic is unit-tested in environments without torch.
    """
    tags = ["O"] * n_words
    confs = [0.0] * n_words
    seen: set[int] = set()
    for pos, wid in enumerate(word_ids):
        if wid is None or wid in seen:
            continue
        seen.add(wid)
        tags[wid] = id2label[int(pred_ids[pos])]
        confs[wid] = float(confidences[pos])
    return tags, confs


class BertModel:  # pragma: no cover - torch/transformers absent in this sandbox
    """Real HF token-classification backend (torch-gated).

    Interface-compatible with :class:`AliasModel`: ``tag(tokens) -> (tags,
    confs)``. Loads the fine-tuned checkpoint once per actor (the Ray-native
    replacement for the reference's TorchServe ``initialize``,
    ``model_handler.py:103-124``) and reproduces the reference's realignment
    semantics (``cli_tagger_no_torch_serve.py:208-226``): the prediction of
    the FIRST wordpiece of each word is the word's tag; words whose first
    wordpiece falls beyond ``max_length`` are silently ``'O'``. Confidence is
    the softmax probability of the argmax class at that wordpiece
    (``single_task/newsagency_ner.py:221-231``).

    Construction verifies the dependency so actor init fails fast rather
    than at first batch. Exercised only where torch+transformers exist.
    """

    sys_id = "BERT MODEL"

    def __init__(self, model_path: str, max_tokens: int = MAX_TOKENS_PER_SENTENCE):
        try:
            import torch
            from transformers import AutoModelForTokenClassification, AutoTokenizer
        except ImportError as e:
            raise NotImplementedError(
                "BertModel needs torch+transformers; use AliasModel in this environment"
            ) from e
        self._torch = torch
        self.max_tokens = max_tokens
        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForTokenClassification.from_pretrained(model_path)
        self.model.eval()
        self.device = "cuda" if torch.cuda.is_available() else "cpu"
        self.model.to(self.device)
        self.id2label = {int(k): v for k, v in self.model.config.id2label.items()}

    chunk_sentences = 32  # sentences per padded forward

    def tag(self, tokens: list[Span]) -> tuple[list[str], list[float]]:
        return self.tag_batch([tokens])[0]

    def tag_batch(
        self, token_lists: list[list[Span]]
    ) -> list[tuple[list[str], list[float]]]:
        """ONE padded tokenizer+forward call per length-sorted chunk.

        The reference runs one forward per sentence
        (cli_tagger_no_torch_serve.py:298, its documented bottleneck at >99 %
        of batch wall-time); here all sentences of the Arrow batch share
        padded forwards. Realign semantics are per sentence via
        ``enc.word_ids(i)`` — first wordpiece carries the word's prediction,
        words truncated beyond ``max_length`` stay ``'O'`` (reference
        cli_tagger_no_torch_serve.py:208-226), identical to the per-sentence
        path because truncation/padding are per-row in a batched tokenizer.
        """
        torch = self._torch
        n = len(token_lists)
        out: list = [None] * n
        order = sorted(range(n), key=lambda i: len(token_lists[i]))
        ch = self.chunk_sentences
        for c0 in range(0, n, ch):
            idxs = order[c0:c0 + ch]
            words = [[t.text for t in token_lists[i]] for i in idxs]
            enc = self.tokenizer(
                words, is_split_into_words=True, truncation=True, padding=True,
                max_length=self.max_tokens, return_tensors="pt",
            ).to(self.device)
            with torch.no_grad():
                logits = self.model(**enc).logits  # (b, seq, n_labels)
            probs = torch.softmax(logits, dim=-1)
            pred = probs.argmax(dim=-1)
            conf = probs.gather(-1, pred.unsqueeze(-1)).squeeze(-1)
            for bi, i in enumerate(idxs):
                out[i] = realign_wordpieces(
                    enc.word_ids(bi), pred[bi].tolist(), conf[bi].tolist(),
                    len(words[bi]), self.id2label,
                )
        return out


class TaggerStage:
    """``map_batches`` actor: pages (url, text, lang, warc_ts) → mentions table."""

    def __init__(self, model: str = "alias", max_tokens: int = MAX_TOKENS_PER_SENTENCE):
        if model == "alias":
            self.model = AliasModel(max_tokens)
        elif model == "simbert":
            self.model = SimulatedBertModel(max_tokens)
        else:
            self.model = BertModel(model, max_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        tss = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names else [None] * len(urls)
        gate = getattr(self.model, "has_candidates", None)
        # phase 1: segment + gate + tokenize every article of the batch
        sents: list[tuple] = []  # (url, lang, ts, sent_idx, sent Span, tokens)
        for url, text, lang, ts in zip(urls, texts, langs, tss):
            if not text:
                continue
            if gate is not None and not gate(text):
                continue
            for sent_idx, sent in enumerate(segment_sentences(text)):
                if gate is not None and not gate(sent.text):
                    continue
                tokens = tokenize_with_spans(sent.text)
                if tokens:
                    sents.append((url, lang, ts, sent_idx, sent, tokens))
        # phase 2: ONE batched model call over all gated sentences (the
        # backend chunks + pads internally) — not one forward per sentence
        if sents:
            tagged = self.model.tag_batch([s[5] for s in sents])
            # phase 3: BIO decode + mention emit per sentence
            for (url, lang, ts, sent_idx, sent, tokens), (tags, confs) in zip(
                sents, tagged
            ):
                self._emit(cols, url, lang, ts, sent_idx, sent, tokens, tags, confs)
        return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)

    def _emit(self, cols, url, lang, ts, sent_idx, sent, tokens, tags, confs) -> None:
        for span in decode_bio(sent.text, tokens, tags):
            surface = span.surface
            # mention post-filter (M7)
            if len(surface) <= 1 or is_punct_only(surface):
                continue
            fine = span.label
            if "ATB" in fine:  # M9 typo fix
                fine = fine.replace("ATB", "ATS")
            short = fine.split(".")[-1]
            l_sent, r_sent = span.start, span.end
            l_art, r_art = sent.start + l_sent, sent.start + r_sent
            conf = sum(confs[span.tok_start:span.tok_end]) / (span.tok_end - span.tok_start)
            cols["url"].append(url)
            cols["lang"].append(lang)
            cols["warc_ts"].append(ts)
            cols["entity"].append(fine)
            cols["surface"].append(surface)
            cols["qid"].append(qid_for_label(short))
            cols["sentence_idx"].append(sent_idx)
            cols["l_sent"].append(l_sent)
            cols["r_sent"].append(r_sent)
            cols["l_art"].append(l_art)
            cols["r_art"].append(r_art)
            cols["confidence"].append(conf)
            cols["mention_id"].append(
                mention_id(url, sent_idx, l_sent, r_sent, l_art, r_art, lang)
            )
