"""clean_corpus funnel: each gate drops exactly the doc crafted for it."""

import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.clean import clean_corpus

# 30 distinct words, 'the'/'is'/'it' give the en-profile signal, long
# words keep alpha_ratio above the gate, no repeated bigram
_BASE = (
    "the modernized european research consortium publishes detailed "
    "quarterly analysis reports covering advanced industrial machinery "
    "standards while it simultaneously maintains rigorous compliance "
    "documentation across seventeen regional manufacturing divisions "
    "and is expanding toward sustainable production"
)
_GOOD2 = (
    "the collaborative astronomy initiative operates multiple "
    "observatory networks gathering spectral measurements from distant "
    "galactic formations while it catalogs stellar luminosity records "
    "and is preparing comprehensive navigational almanacs for "
    "interplanetary exploration missions throughout coming decades"
)


def _corpus():
    texts = [
        _BASE,                                        # 0 kept
        "der anspruchsvolle industriemechaniker und die moderne "
        "forschungsgemeinschaft ist nicht ein problem zu bewaeltigen "
        "mit ausreichender finanzierung und langfristiger planung",  # 1 lang
        "the tiny note",                              # 2 too short
        "the 111111 222222 333333 444444 555555 666666 777777 888888 "
        "999999 000000 111111 222222 333333 444444 555555 666666",   # 3 alpha
        "the powerful engine runs " * 8,              # 4 repetition
        _BASE,                                        # 5 exact dup of 0
        _BASE.replace("seventeen", "nineteen"),       # 6 near dup of 0
        _GOOD2,                                       # 7 kept
    ]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_funnel_drops_each_class():
    kept, funnel = clean_corpus(_corpus(), num_buckets=8)
    ids = sorted(kept.to_pandas()["doc_id"].tolist())
    assert ids == [0, 7]
    assert funnel == {
        "input": 8,
        "after_gates": 4,        # 0, 5, 6, 7
        "after_exact_dedup": 3,  # 5 collapses into 0
        "after_fuzzy_dedup": 2,  # 6 near-dups 0
    }


def test_thresholds_are_parameters():
    # loosening every gate keeps everything except the dup classes
    kept, funnel = clean_corpus(
        _corpus(),
        allowed_langs=("en", "de", "und"),
        min_chars=1,
        min_alpha=0.0,
        max_dup_bigram=1.0,
        num_buckets=8,
    )
    assert funnel["after_gates"] == 8
    assert funnel["after_exact_dedup"] == 7
    ids = sorted(kept.to_pandas()["doc_id"].tolist())
    assert 0 in ids and 5 not in ids and 6 not in ids
