"""PII redaction and unigram-LM scoring unit tests."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.lm_score import (
    fit_unigram,
    score_unigram,
)
from web_based_search_engine_ray.pipelines.redact import redact, redact_batch


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_redact_patterns(ray_session):
    out = (
        redact(
            _ds(
                [
                    "mail me at jane.doe+spam@example.co.uk thanks",
                    "server at 192.168.0.1 and 10.0.0.255 responded",
                    "call +1-555-123-4567 or 555 867 5309 now",
                    "nothing sensitive here",
                ]
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "text_redacted"] == "mail me at <EMAIL> thanks"
    assert out.loc[0, "n_email"] == 1
    assert out.loc[1, "text_redacted"] == (
        "server at <IP> and <IP> responded"
    )
    assert out.loc[1, "n_ipv4"] == 2
    assert out.loc[2, "text_redacted"] == "call <PHONE> or <PHONE> now"
    assert out.loc[2, "n_phone"] == 2
    assert out.loc[3, "text_redacted"] == "nothing sensitive here"
    assert (
        out.loc[3, ["n_email", "n_ipv4", "n_phone"]].tolist() == [0, 0, 0]
    )


def test_redact_order_email_before_phone():
    """Digits inside an email must not be phone-eaten."""
    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(
                ["reach 12345678901@textmsg.example.com ok"],
                type=pa.string(),
            ),
        }
    )
    out = redact_batch(t)
    assert out["text_redacted"][0].as_py() == "reach <EMAIL> ok"
    assert out["n_phone"][0].as_py() == 0


def test_lm_score_closed_form(ray_session):
    # corpus: "a a b" and "b c": counts a=2 b=2 c=1, total=5, vocab=3
    docs = _ds(["a a b", "b c"])
    model = fit_unigram(docs)
    assert model["total"] == 5 and model["vocab"] == 3
    denom = 5 + 3 + 1
    la = math.log(3 / denom)  # (2+1)/9
    lb = math.log(3 / denom)
    lc = math.log(2 / denom)
    out = (
        score_unigram(docs, model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 2]
    assert abs(out.loc[0, "lm_score"] - (2 * la + lb) / 3) < 1e-12
    assert abs(out.loc[1, "lm_score"] - (lb + lc) / 2) < 1e-12


def test_lm_score_oov_and_empty(ray_session):
    model = fit_unigram(_ds(["a a b"]))
    out = (
        score_unigram(_ds(["zzz qqq", ""]), model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # both tokens OOV: score = logp_oov
    assert abs(out.loc[0, "lm_score"] - model["logp_oov"]) < 1e-12
    assert out.loc[1, "n_tokens"] == 0 and out.loc[1, "lm_score"] == 0.0


def test_lm_vocab_cap(ray_session):
    # 5 types; cap at 2 keeps the 2 most frequent, rest score OOV
    docs = _ds(["a a a b b c d e"])
    model = fit_unigram(docs, max_vocab=2)
    assert model["vocab"] == 2 and model["total"] == 5  # a:3 + b:2
    out = score_unigram(_ds(["c"]), model).to_pandas()
    assert abs(out.loc[0, "lm_score"] - model["logp_oov"]) < 1e-12
