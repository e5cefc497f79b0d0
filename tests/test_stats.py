"""TextStatsStage unit tests: metric definitions + language ID heuristic."""

import pyarrow as pa

from fastdup_ray.stages.stats import TextStatsStage

_SENTENCES = {
    "en": "the cat sat on the mat and it was a good day for this kind of thing",
    "de": "der hund lief durch die stadt und das wetter war nicht gut für einen spaziergang",
    "fr": "le chien est dans la maison et il ne veut pas sortir pour une promenade dans les rues",
    "es": "el perro está en la casa y no quiere salir para un paseo por las calles de la ciudad",
    "zh": "今天天气很好我们一起去公园散步吧这是一个美好的日子",
}


def _stats(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return TextStatsStage()(batch).to_pylist()


def test_metric_definitions():
    rows = _stats(["ab cd ef\ngh ij", ""])
    r = rows[0]
    assert r["n_chars"] == 14
    assert r["n_tokens"] == 5
    assert r["n_lines"] == 2
    assert r["uniq_token_ratio"] == 1.0
    assert r["mean_word_len"] == 2.0
    assert r["digit_ratio"] == 0.0
    empty = rows[1]
    assert empty["n_chars"] == 0 and empty["n_tokens"] == 0 and empty["n_lines"] == 0
    assert empty["lang_pred"] == "unknown"


def test_digit_and_non_ascii():
    r = _stats(["a1 b2 ü3"])[0]
    assert r["n_chars"] == 8
    assert abs(r["digit_ratio"] - 3 / 8) < 1e-9
    assert abs(r["non_ascii_ratio"] - 1 / 8) < 1e-9


def test_lang_id_heuristic():
    texts = list(_SENTENCES.values())
    langs = list(_SENTENCES.keys())
    rows = _stats(texts)
    for want, row in zip(langs, rows):
        assert row["lang_pred"] == want, f"{want}: got {row['lang_pred']}"
        assert row["lang_score"] > 0


def test_quality_scores_ordered():
    good = "the " + " ".join(f"word{i} thing stuff" for i in range(40))
    repetitive = "spam " * 200
    rows = _stats([good, repetitive.strip()])
    assert rows[0]["quality"] > rows[1]["quality"]
