"""Entity-linker stage (T5): surface form → canonical agency + Wikidata QID.

The reference's linking is a dict lookup keyed on the *predicted class*
(``cli_tagger.py:202-209``); the north-star upgrades it to a surface-form
linker: alias index + normalized-edit-distance scoring so OCR-noisy surfaces
(``Havaas`` → canonical ``Havas``, golden fixture
``tests/na_tagger_out.jsonl``) still resolve.

Actor-pool stage: the alias index (exact map + per-length buckets for the
banded-Levenshtein fallback) is built once per actor in ``__init__`` from the
broadcast vocabulary (SURVEY.md §2.4 J1 — small side rides with the actor,
never a shuffle join). Per batch the lookup is memoised on the batch's
*unique* surfaces — the surface distribution is extremely Zipfian
(Reuters/Havas head, reference README.md:88-90), so a batch of 10⁴ mentions
typically resolves <10² distinct surfaces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textproc import edit_distance, normalize_surface
from ..vocab import ALIAS_TO_CANONICAL_NORM, WIKIDATA_IDS, qid_for_label


class LinkerStage:
    """mentions table → + (canonical: string, qid: string, link_score: float32)."""

    def __init__(self, max_edit_distance: int = 2):
        self.max_ed = max_edit_distance
        self.exact = dict(ALIAS_TO_CANONICAL_NORM)  # normalized alias -> canonical
        # length-bucketed alias list for the banded-Levenshtein fallback
        self.by_len: dict[int, list[tuple[str, str]]] = {}
        for alias, canon in self.exact.items():
            for ln in range(len(alias) - max_edit_distance, len(alias) + max_edit_distance + 1):
                self.by_len.setdefault(ln, []).append((alias, canon))
        self.cache: dict[str, tuple[str, str, float]] = {}

    def resolve(self, surface: str) -> tuple[str, str, float]:
        """→ (canonical name | '', qid | 'NIL', score∈[0,1])."""
        hit = self.cache.get(surface)
        if hit is not None:
            return hit
        norm = normalize_surface(surface)
        out = ("", "NIL", 0.0)
        canon = self.exact.get(norm)
        if canon is not None:
            out = (canon, qid_for_label(canon), 1.0)
        elif norm:
            best, best_d = None, self.max_ed + 1
            for alias, cand in self.by_len.get(len(norm), ()):
                d = edit_distance(norm, alias, self.max_ed)
                if d < best_d:
                    best, best_d = cand, d
                    if d == 1:
                        break
            if best is not None and best_d <= self.max_ed:
                out = (best, qid_for_label(best), 1.0 - best_d / (self.max_ed + 1))
        if len(self.cache) < 1_000_000:  # bound actor memory on hostile inputs
            self.cache[surface] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"]
        uniq = pc.unique(surfaces).to_pylist()
        table = {s: self.resolve(s) for s in uniq}
        vals = [table[s] for s in surfaces.to_pylist()]
        canonical = pa.array([v[0] for v in vals], type=pa.string())
        qid = pa.array([v[1] for v in vals], type=pa.string())
        score = pa.array([v[2] for v in vals], type=pa.float32())
        out = batch
        if "qid" in out.column_names:
            out = out.drop_columns(["qid"])
        return (
            out.append_column("canonical", canonical)
            .append_column("qid", qid)
            .append_column("link_score", score)
        )


def agency_nodes_table() -> pa.Table:
    """Static agency node table (canonical, qid) — broadcast dimension."""
    names = list(WIKIDATA_IDS)
    return pa.table(
        {
            "canonical": pa.array(names, type=pa.string()),
            "qid": pa.array([WIKIDATA_IDS[n] for n in names], type=pa.string()),
        }
    )
