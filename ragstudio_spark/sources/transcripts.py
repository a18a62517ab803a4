"""Deterministic synthetic multi-turn transcript generator.

Produces the engine's primary input table ``(conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp)`` per the FIXTURES.md
contract: conversation lengths Zipf-distributed with skewed outliers, text
payloads drawn from a four-flavor corpus (plain prose, HTML pages with
boilerplate, PDF-extraction artifacts, markdown) that embeds exactly the
artifact patterns the extraction operators target, ~1% empty turns, a
deterministic language mix (fr/en/de) to exercise the language filter, and
~2% OCR-garbage turns to trip the readability gate.

Everything is a pure function of ``(seed, conv_index, turn_idx)`` — no RNG
state crosses rows — so generation is embarrassingly parallel: the Spark
builder runs it as ``mapInPandas`` over ``spark.range`` and two runs at any
parallelism produce identical tables.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

BASE_TS = datetime(2024, 1, 1)

_EN_SENTENCES = [
    "The extraction pipeline processes each document in a streaming fashion.",
    "Engineers reviewed the design before the quarterly planning session began.",
    "A distributed system must tolerate partial failure without losing data.",
    "The report summarizes findings from the latest field experiment in detail.",
    "Throughput improved after the cache layer was introduced last spring.",
    "Most readers skim the introduction and jump straight to the results.",
    "The committee approved the proposal after a long and careful debate.",
    "Observability tooling makes production incidents far easier to diagnose.",
    "The harbor town grew quiet as the evening fog rolled in from the sea.",
    "Careful benchmarking separates real improvements from measurement noise.",
]
_FR_SENTENCES = [
    "La voiture électrique propose une autonomie remarquable sur autoroute.",
    "Le rapport présente les résultats des essais menés dans la région.",
    "Les ingénieurs ont validé la configuration avant la mise en production.",
    "Cette méthode permet de réduire le temps de traitement des documents.",
    "Le moteur hybride combine performance et sobriété pour la conduite urbaine.",
    "La bibliothèque municipale ouvre ses portes tous les jours de la semaine.",
    "Les nouveaux systèmes d'aide à la conduite améliorent la sécurité routière.",
    "Une analyse approfondie révèle des écarts significatifs entre les mesures.",
    "Le chapitre suivant décrit la procédure d'installation du logiciel.",
    "Les paramètres de configuration sont documentés dans le guide technique.",
]
_DE_SENTENCES = [
    "Der Bericht beschreibt die Ergebnisse der letzten Messung im Labor.",
    "Die neue Anlage ist seit dem Frühjahr ohne Störung in Betrieb.",
    "Eine sorgfältige Planung ist für den Erfolg des Projekts entscheidend.",
]

_OCR_GARBAGE_WORDS = [
    ".S89IN0SXe", "~QuaWeanesedus|", "Jeu900", "B,)", "aJANe0",
    "wedinbZ,|", "a}UasaYU", "UONeIOeNEJ", "JUSWEWLIOJUOD", "x9TR4qz",
]

_HTML_TEMPLATE = """<html><head><title>{title}</title><style>.m{{color:#333}}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/blog">Blog</a> <a href="/about">About</a></nav>
<div class="sidebar"><ul><li><a href="/l1">Quick link one</a></li><li><a href="/l2">Quick link two</a></li><li><a href="/l3">Quick link three</a></li></ul></div>
<article>
<h1>{title}</h1>
{paragraphs}
</article>
<footer><a href="/contact">Contact</a> <a href="/terms">Terms of use</a> <span>© 2024 Example Corp</span></footer>
</body></html>"""


def _sentences_for(lang: str) -> list[str]:
    return {"en": _EN_SENTENCES, "fr": _FR_SENTENCES, "de": _DE_SENTENCES}[lang]


def _prose(rng: random.Random, lang: str, n_sentences: int) -> str:
    bank = _sentences_for(lang)
    parts = []
    for i in range(n_sentences):
        s = bank[rng.randrange(len(bank))]
        # inject a varying token so long texts aren't pathologically repetitive
        if rng.random() < 0.3:
            s = s[:-1] + f" (section {rng.randrange(1000)})."
        parts.append(s)
    return " ".join(parts)


def _plain_payload(rng: random.Random, lang: str) -> str:
    n = rng.choice([3, 5, 8, 15, 30, 60])
    paras = []
    remaining = n
    while remaining > 0:
        k = min(remaining, rng.randrange(2, 6))
        paras.append(_prose(rng, lang, k))
        remaining -= k
    return "\n\n".join(paras)


def _pdf_payload(rng: random.Random, lang: str) -> str:
    """Prose interleaved with the artifact patterns of pdf_cleaner.py and
    the TextPreprocessor fixtures."""
    lines: list[str] = []
    n_blocks = rng.randrange(2, 7)
    for b in range(n_blocks):
        lines.append(_prose(rng, lang, rng.randrange(2, 5)))
        roll = rng.random()
        if roll < 0.25:
            lines.append(f"- Page {rng.randrange(1, 99)} -")
        elif roll < 0.40:
            lines.append(str(rng.randrange(1, 200)))
            lines.append("Nouvelle section commence ici avec une majuscule.")
        elif roll < 0.55:
            lines.append("Equipe-\nment livré avec le véhicule")
        elif roll < 0.65:
            lines.append("| | | |")
            lines.append("-----")
        elif roll < 0.75:
            lines.append("e\nm\nm\na")
        elif roll < 0.85:
            lines.append("Cela apermis de distinguer Ala fin eouvert la suite")
    if rng.random() < 0.12:
        # OCR-garbage turn: enough invalid words to trip the gate
        garbage = " ".join(rng.choice(_OCR_GARBAGE_WORDS) for _ in range(40))
        return garbage
    return "\n".join(lines)


def _markdown_payload(rng: random.Random, lang: str) -> str:
    depth = rng.choice([1, 2, 2, 3])
    size_tier = rng.choice(["s", "s", "m", "l"])
    sent_per_sec = {"s": 3, "m": 25, "l": 80}[size_tier]
    out = [f"# Document {rng.randrange(10000)}"]
    for i in range(rng.randrange(2, 5)):
        out.append(f"\n## Section {i + 1}\n")
        if depth >= 3:
            out.append(f"### Détail {i + 1}.1\n")
        out.append(_prose(rng, lang, sent_per_sec))
        if rng.random() < 0.3:
            out.append("\n- premier élément\n- deuxième élément\n- troisième élément")
        if rng.random() < 0.2:
            out.append(
                "\n| colonne A | colonne B | colonne C |\n"
                "| --- | --- | --- |\n"
                "| a1 | b1 | c1 |\n| a2 | b2 | c2 |"
            )
    return "\n".join(out)


def _html_payload(rng: random.Random, lang: str) -> str:
    n_paras = rng.randrange(2, 6)
    paragraphs = "\n".join(
        f"<p>{_prose(rng, lang, rng.randrange(2, 5))}</p>" for _ in range(n_paras)
    )
    return _HTML_TEMPLATE.format(
        title=f"Article {rng.randrange(10000)}", paragraphs=paragraphs
    )


def synth_turn(seed: int, conv_index: int, turn_idx: int) -> tuple[str, str, str | None]:
    """(text, role, tool) for one turn — pure function of its coordinates."""
    rng = random.Random(f"{seed}:{conv_index}:{turn_idx}")
    role = ("user", "assistant", "tool")[turn_idx % 3]
    # language fixed per conversation: 60% fr / 30% en / 10% de
    lang_roll = random.Random(f"{seed}:lang:{conv_index}").random()
    lang = "fr" if lang_roll < 0.6 else ("en" if lang_roll < 0.9 else "de")

    flavor_roll = rng.random()
    if flavor_roll < 0.01:
        text = ""
    elif flavor_roll < 0.71:
        text = _plain_payload(rng, lang)
    elif flavor_roll < 0.81:
        text = _html_payload(rng, lang)
    elif flavor_roll < 0.91:
        text = _pdf_payload(rng, lang)
    else:
        text = _markdown_payload(rng, lang)

    tool = None
    if role == "tool":
        tool = f'{{"tool": "search", "status": "ok", "call_id": {rng.randrange(10**6)}}}'
    return text, role, tool


def conversation_lengths(n_convs: int, seed: int = 42) -> np.ndarray:
    """Zipf-ish conversation lengths in [1, 500] with ~0.1% long outliers
    (×20 tail) to exercise skew handling. Deterministic in ``seed``."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(1.6, size=n_convs)
    lengths = np.clip(raw, 1, 500).astype(np.int64)
    outliers = rng.random(n_convs) < 0.001
    lengths[outliers] = np.minimum(lengths[outliers] * 20, 2000)
    return lengths


def generate_pandas(n_turns: int, seed: int = 42, avg_conv_len: int = 8) -> pd.DataFrame:
    """Driver-side (small-scale) generation, used by tests as the oracle
    input and by the Spark builder for partition slices."""
    n_convs = max(1, n_turns // avg_conv_len)
    lengths = conversation_lengths(n_convs, seed)
    # make sure we cover n_turns
    while lengths.sum() < n_turns:
        lengths = np.concatenate([lengths, conversation_lengths(n_convs, seed + 1)])
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return _rows_for_range(np.arange(n_turns), offsets, seed)


def _rows_for_range(global_ids: np.ndarray, offsets: np.ndarray, seed: int) -> pd.DataFrame:
    conv_idx = np.searchsorted(offsets, global_ids, side="right") - 1
    turn_idx = global_ids - offsets[conv_idx]
    rows = []
    for gid, ci, ti in zip(global_ids, conv_idx, turn_idx):
        text, role, tool = synth_turn(seed, int(ci), int(ti))
        rows.append(
            (
                f"conv_{int(ci):08d}",
                int(ti),
                role,
                text,
                tool,
                BASE_TS + timedelta(seconds=int(gid)),
            )
        )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(spark, n_turns: int, seed: int = 42, avg_conv_len: int = 8,
                   partitions: int | None = None):
    """Distributed generation: ``spark.range(n_turns)`` → mapInPandas.

    The conversation-boundary prefix-sum array is O(n_convs) and broadcast
    to executors; at true 10^12-turn scale you would materialize it once as
    a bucketed conversation-dimension table instead — the per-turn work is
    already embarrassingly parallel and shuffle-free.
    """
    n_convs = max(1, n_turns // avg_conv_len)
    lengths = conversation_lengths(n_convs, seed)
    while lengths.sum() < n_turns:
        lengths = np.concatenate([lengths, conversation_lengths(n_convs, seed + 1)])
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    bc_offsets = spark.sparkContext.broadcast(offsets)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield _rows_for_range(ids, bc_offsets.value, seed)

    rng_df = spark.range(0, n_turns, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
