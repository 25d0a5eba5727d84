"""M10 highlight_text (queries.kg_highlight vs app.py:517-538): badge
markup semantics on planted examples."""

import pandas as pd
import pyarrow as pa

from biomedical_ner_ray.fixtures import alias_rows
from biomedical_ner_ray.kernels.tagger import AliasDict, tag_tokens
from biomedical_ner_ray.kernels.tokenize import MAX_SEQ_LEN, TOKEN_RE


def _render_one(text: str, alias: AliasDict) -> str:
    """Reference formulation: per-token loop, exactly app.py:522-538
    minus the color/name lookups."""
    toks = TOKEN_RE.findall(text)[:MAX_SEQ_LEN]
    tags = tag_tokens(toks, alias)
    out = []
    for tok, tg in zip(toks, tags):
        if tg == "O":
            out.append(tok)
        else:
            out.append(
                f'<span class="entity-badge">{tok}'
                f'<span class="entity-tag">{tg}</span></span>'
            )
    return " ".join(out)


def test_badge_markup_semantics():
    alias = AliasDict(alias_rows())
    # pick a real multi-token alias from the bank so B-/I- both appear
    entry = next(e for k, e in alias.by_key.items() if " " in k)
    text = f"start {entry.surface} end"
    html = _render_one(text, alias)
    assert html.startswith("start <span")
    assert html.endswith("</span></span> end")
    assert f'<span class="entity-tag">B-{entry.type}</span>' in html
    assert f'<span class="entity-tag">I-{entry.type}</span>' in html
    # untagged text passes through verbatim
    assert _render_one("plain words only", alias) == "plain words only"


def test_query_matches_reference_loop(ray_session, tiny_fixture):
    from biomedical_ner_ray import queries as Q

    ds = Q.kg_highlight("/root/testdata/sf0.001")
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    alias = AliasDict(alias_rows())
    import pyarrow.parquet as pq
    from biomedical_ner_ray.state.manifest import list_parquet_files

    t = (
        pq.read_table(
            list_parquet_files(tiny_fixture["transcripts"]),
            columns=["conv_id", "turn_idx", "text"],
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    exp = {
        (c, ti): _render_one(tx, alias)
        for c, ti, tx in zip(t.conv_id, t.turn_idx, t.text)
        if TOKEN_RE.findall(tx or "")
    }
    assert len(got) == len(exp)
    for c, ti, h in zip(got.conv_id, got.turn_idx, got.html):
        assert exp[(c, ti)] == h
