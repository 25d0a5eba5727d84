"""Deterministic synthetic transcript + alias-dictionary fixtures.

Schemas follow ``BASELINE.json`` ``input_hint`` exactly
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]) and FIXTURES.md. Generation is seed-stable (seed=42,
``random.Random``) and needs no external data; the same tables are used
by the pytest oracle-comparison suite, the driver correctness gate
(via ``__ray_entry__``) and ``bench.py``.

Planted edge cases (each traced to a reference behavior — FIXTURES.md §1):
hyphenated tokens (app.py:213 tokenizer), nested-longest aliases
("HeLa" ⊂ "HeLa cells"), mixed-case aliases (creation_vocabulaire.py:118
lowercasing), pure-digit tokens (creation_vocabulaire.py:113 <NUM>),
>100-token turns whose late mentions must be dropped (app.py:218-219
truncation), ambiguous multi-CUI aliases (top-1 link resolution), and
shared-alias CUI chains (canonicalization connected components).

The generator guarantees dictionary matches never partially overlap
(only nested-at-same-extent containment), so greedy longest-match
(kernels.tagger) and SQL maximal-match (oracle_sql) provably agree;
``tests/test_fixture_properties.py`` asserts it.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .kernels.tokenize import tokenize_text

FIXTURE_VERSION = 4
SEED = 42
FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_ROOT", "/tmp/graft_fixtures")

# sf name -> number of conversations (turn count ≈ 12×convs + hot tail)
SF_CONVS = {
    "sf0.001": 120,
    "sf0.01": 1200,
    "sf0.1": 12000,
    "sf1": 120000,
    # scaling-bench fixtures: sized so per-leg compute dominates cluster
    # bring-up + the serial stage tail at BOTH widths (strong scaling
    # needs the job big enough for the wider leg to stay compute-bound).
    # sf3 was the round-4 size; round 5's batched-Viterbi serving
    # halved the parallel CPU·s (Amdahl fit: P 946→528 CPU·s, fixed
    # S≈15 s unchanged), so sf6 restores load ∝ speed — the same move
    # round 4 made (sf1→sf3) for the same reason.
    "sf3": 360000,
    "sf6": 720000,
}

# ---------------------------------------------------------------------------
# Alias bank: (cui, canonical_name, type, [alias surfaces])
# Types are the reference's label space (datasets/JNLPBA/classes.txt +
# NCBI Disease; app.py:82-115).
# ---------------------------------------------------------------------------
ALIAS_BANK: list[tuple[str, str, str, list[str]]] = [
    # --- DNA ---
    ("C0000001", "BRCA1 gene", "DNA", ["BRCA1", "BRCA1 gene"]),
    ("C0000002", "BRCA2 gene", "DNA", ["BRCA2"]),
    ("C0000003", "TP53 gene", "DNA", ["TP53", "TP53 gene"]),
    ("C0000004", "IL-2 gene", "DNA", ["IL-2 gene"]),
    ("C0000005", "octamer motif", "DNA", ["octamer motif"]),
    ("C0000006", "IgH enhancer", "DNA", ["IgH enhancer", "immunoglobulin heavy-chain enhancer"]),
    # --- RNA ---
    ("C0000010", "IL-2 mRNA", "RNA", ["IL-2 mRNA"]),
    ("C0000011", "TNF-alpha mRNA", "RNA", ["TNF-alpha mRNA"]),
    ("C0000012", "GATA-1 transcript", "RNA", ["GATA-1 transcript"]),
    # --- protein ---
    ("C0000020", "p53 protein", "protein", ["p53", "p53 protein"]),
    ("C0000021", "NF-kappa B", "protein", ["NF-kappa B", "NF-kappaB"]),
    ("C0000022", "interleukin-2", "protein", ["interleukin-2", "IL-2"]),
    ("C0000023", "octamer-binding protein", "protein", ["octamer-binding proteins", "octamer-binding protein"]),
    ("C0000024", "STAT3", "protein", ["STAT3"]),
    ("C0000025", "tumor necrosis factor", "protein", ["tumor necrosis factor", "TNF-alpha"]),
    ("C0000026", "TNF", "protein", ["TNF", "tumor necrosis factor"]),  # shares alias with C0000025 -> merge
    ("C0000027", "GATA-1", "protein", ["GATA-1"]),
    # --- cell_line ---
    ("C0000030", "HeLa cell line", "cell_line", ["HeLa", "HeLa cells"]),
    ("C0000031", "Jurkat cell line", "cell_line", ["Jurkat", "Jurkat cells"]),
    ("C0000032", "K562 cell line", "cell_line", ["K562"]),
    # --- cell_type ---
    ("C0000040", "T lymphocyte", "cell_type", ["T lymphocytes", "T cells"]),
    ("C0000041", "monocyte", "cell_type", ["monocytes"]),
    ("C0000042", "B lymphocyte", "cell_type", ["B cells"]),
    # --- Disease ---
    ("C0000050", "breast cancer", "Disease", ["breast cancer", "breast carcinoma"]),
    ("C0000051", "acute lymphoblastic leukemia", "Disease", ["leukemia", "acute lymphoblastic leukemia"]),
    ("C0000052", "colorectal cancer", "Disease", ["colorectal cancer"]),
    ("C0000053", "Li-Fraumeni syndrome", "Disease", ["Li-Fraumeni syndrome"]),
    ("C0000054", "type 2 diabetes", "Disease", ["type 2 diabetes", "diabetes mellitus", "diabetes"]),
    # canonicalization chain: C0000050 -- breast carcinoma -- C0000055 -- mammary carcinoma -- C0000056
    ("C0000055", "mammary carcinoma", "Disease", ["breast carcinoma", "mammary carcinoma"]),
    ("C0000056", "mammary tumour", "Disease", ["mammary carcinoma", "mammary tumour"]),
]

# Templates: {slot} names are entity types; *2 suffix = second distinct pick.
TEMPLATES: list[str] = [
    "Mutations in the {DNA} are associated with {Disease}.",
    "{protein} binds to the {DNA} promoter in {cell_line}.",
    "Expression of {RNA} was upregulated in {cell_type}.",
    "{protein} and {protein2} interact in {cell_line}.",
    "Patients with {Disease} often show elevated {protein} levels.",
    "The {DNA} regulates {RNA} levels in {cell_type}.",
    "We detected {protein} expression in both {cell_line} and {cell_line2}.",
    "{Disease} risk correlates with {DNA} mutations in {cell_type}.",
    "Knockdown of {protein} reduced {RNA} abundance.",
    "In {cell_line}, {protein} activates transcription of the {DNA}.",
]

DISTRACTORS: list[str] = [
    "Thanks, that answers my question.",
    "Could you summarize the previous findings?",
    "Running the annotation tool now, give me a second.",
    "The meeting is at 10 30 tomorrow, room 204.",
    "Sure - uploading the 2 files (v1 and v2) right away.",
    "Octamer-binding assays use V-(D)-J segment constructs as controls.",
    "No further action needed here.",
]

ROLES = ("user", "assistant", "tool")
# Tool-name bank for role == "tool" turns (fixture v4). The pick is an
# md5 pure function of (conv_id, turn_idx) — NOT an rng draw — so the
# text/role/ts streams are byte-identical to v3 and only the `tool`
# column gained diversity (the input_hint column was degenerate before,
# which made tool-usage analytics untestable).
TOOL_BANK = ("annotator", "linker", "retriever", "summarizer", "validator")
_BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)


def _tool_for(conv_id: str, turn_idx: int) -> str:
    from .kernels.hashing import stable_u64_md5

    h = stable_u64_md5(f"tool:{conv_id}:{turn_idx}".encode("utf-8"))
    return TOOL_BANK[h % len(TOOL_BANK)]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def alias_rows() -> list[dict]:
    """Alias table rows with precomputed alias_key (lowercased token join)."""
    rows = []
    for cui, canonical, etype, surfaces in ALIAS_BANK:
        for surf in surfaces:
            toks = tokenize_text(surf)
            rows.append(
                {
                    "alias": surf,
                    "alias_key": " ".join(t.lower() for t in toks),
                    "n_tokens": len(toks),
                    "cui": cui,
                    "type": etype,
                    "canonical_name": canonical,
                }
            )
    return rows


def _surfaces_by_type() -> dict[str, list[str]]:
    by_type: dict[str, list[str]] = {}
    for _cui, _canon, etype, surfaces in ALIAS_BANK:
        by_type.setdefault(etype, []).extend(surfaces)
    return by_type


def _fill_template(tmpl: str, rng: random.Random, by_type: dict[str, list[str]]) -> str:
    import re as _re

    def repl(m: "_re.Match[str]") -> str:
        slot = m.group(1)
        base = slot[:-1] if slot.endswith("2") else slot
        surf = rng.choice(by_type[base])
        # occasionally lowercase the surface (mixed-case edge case)
        if rng.random() < 0.15:
            surf = surf.lower()
        return surf

    return _re.sub(r"\{(\w+)\}", repl, tmpl)


def _long_turn(rng: random.Random, by_type: dict[str, list[str]]) -> str:
    """>100-token turn: mention planted after token 100 must be dropped."""
    filler = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "sample", "control"])
        for _ in range(110)
    )
    surf = rng.choice(by_type["protein"])
    return f"{filler} {surf} appeared late in the log."

def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    """Deterministic transcript table; rows shuffled out of order."""
    rng = random.Random(seed)
    by_type = _surfaces_by_type()
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    base_us = int(
        (_BASE_TS - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        # heavy tail: 1% of conversations are "hot" (~200 turns)
        if rng.random() < 0.01:
            n_turns = rng.randint(150, 250)
        else:
            n_turns = rng.randint(3, 20)
        conv_base = base_us + c * 3_600_000_000
        for t in range(n_turns):
            role = ROLES[t % 3]
            r = rng.random()
            if r < 0.55:
                text = _fill_template(rng.choice(TEMPLATES), rng, by_type)
                if rng.random() < 0.3:
                    text += " " + _fill_template(rng.choice(TEMPLATES), rng, by_type)
            elif r < 0.97:
                text = rng.choice(DISTRACTORS)
            else:
                text = _long_turn(rng, by_type)
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(_tool_for(conv_id, t) if role == "tool" else "")
            tss.append(conv_base + t * 30_000_000)
    # shuffle row order so the pipeline's (conv_id, turn_idx) sort is load-bearing
    order = list(range(len(conv_ids)))
    rng.shuffle(order)
    return pa.table(
        {
            "conv_id": pa.array([conv_ids[i] for i in order], pa.string()),
            "turn_idx": pa.array([turn_idxs[i] for i in order], pa.int32()),
            "role": pa.array([roles[i] for i in order], pa.string()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "tool": pa.array([tools[i] for i in order], pa.string()),
            "ts": pa.array([tss[i] for i in order], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def alias_table() -> pa.Table:
    rows = alias_rows()
    return pa.table(
        {
            "alias": pa.array([r["alias"] for r in rows], pa.string()),
            "alias_key": pa.array([r["alias_key"] for r in rows], pa.string()),
            "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int32()),
            "cui": pa.array([r["cui"] for r in rows], pa.string()),
            "type": pa.array([r["type"] for r in rows], pa.string()),
            "canonical_name": pa.array([r["canonical_name"] for r in rows], pa.string()),
        }
    )


def fixture_dir(sf_name: str) -> str:
    return os.path.join(FIXTURE_ROOT, f"v{FIXTURE_VERSION}", sf_name)


def ensure_fixture(sf_name: str, n_files: int = 8) -> dict[str, str]:
    """Idempotently materialize the fixture; returns paths.

    ``transcripts`` is written as a directory of ``n_files`` parquet files
    (row-group-sharded) so Ray's read parallelizes; ``alias_dict`` is one
    small file (broadcast side).
    """
    d = fixture_dir(sf_name)
    marker = os.path.join(d, "_complete.json")
    paths = {
        "dir": d,
        "transcripts": os.path.join(d, "transcripts"),
        "transcripts_glob": os.path.join(d, "transcripts", "*.parquet"),
        "alias_dict": os.path.join(d, "alias_dict.parquet"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(paths["transcripts"], exist_ok=True)
    n_convs = SF_CONVS[sf_name]
    table = generate_transcripts(n_convs)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, os.path.join(paths["transcripts"], f"part-{i:05d}.parquet"))
    pq.write_table(alias_table(), paths["alias_dict"])
    with open(marker, "w") as f:
        json.dump({"version": FIXTURE_VERSION, "sf": sf_name, "rows": n, "seed": SEED}, f)
    return paths


def sf_name_from_dir(sf_dir: str) -> str:
    """Map a driver sf_dir like /root/testdata/sf0.01 to a fixture name."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_CONVS else "sf0.01"


# ---------------------------------------------------------------------------
# CoNLL/TSV fixture (S1): a deterministic JNLPBA-shaped token\ttag file
# with the format hazards the reference reader handles
# (fonctions.py:17-59): -DOCSTART- lines, blank-line boundaries,
# malformed (<2 field) lines, and a final unterminated sentence.
# ---------------------------------------------------------------------------

CONLL_VERSION = 1


def generate_conll_text(n_sentences: int, seed: int = SEED) -> str:
    rng = random.Random(seed + 7)
    by_type = _surfaces_by_type()
    types = sorted(by_type)
    fillers = ["the", "expression", "of", "in", "cells", "was", "analysed",
               "with", "binding", "assay", "results", "show", "activation"]
    lines: list[str] = []
    for s in range(n_sentences):
        if s % 37 == 0:
            lines.append("-DOCSTART-\t-X-")
        if s % 53 == 17:
            lines.append("malformed_line_no_tab")
        n_tok = 4 + rng.randrange(8)
        ent_at = rng.randrange(n_tok)
        ent_type = types[rng.randrange(len(types))]
        surface = by_type[ent_type][rng.randrange(len(by_type[ent_type]))]
        ent_toks = surface.split(" ")
        for i in range(n_tok):
            if i == ent_at:
                for j, et in enumerate(ent_toks):
                    lines.append(f"{et}\t{'B' if j == 0 else 'I'}-{ent_type}")
            else:
                lines.append(f"{fillers[rng.randrange(len(fillers))]}\tO")
        if s < n_sentences - 1:
            lines.append("")  # final sentence is unterminated on purpose
    return "\n".join(lines)


def ensure_conll_fixture(sf_name: str) -> str:
    """Idempotently write the CoNLL fixture file; returns its path."""
    d = fixture_dir(sf_name)
    out = os.path.join(d, "conll")
    path = os.path.join(out, "train.tsv")
    marker = os.path.join(out, "_complete.json")
    if os.path.exists(marker):
        return path
    os.makedirs(out, exist_ok=True)
    n_sentences = max(SF_CONVS[sf_name] // 2, 50)
    with open(path, "w", encoding="utf-8") as f:
        f.write(generate_conll_text(n_sentences))
    with open(marker, "w") as f:
        json.dump({"version": CONLL_VERSION, "sentences": n_sentences}, f)
    return path
