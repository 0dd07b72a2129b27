"""AttributeSnippets + TF-IDF consistency substrate (data/snippets.py)."""
import json

import numpy as np

from devqa_tpu.data.snippets import (AttributeSnippets, TfidfVectorizer,
                                     tfidf_consistency)


def test_attribute_snippets_indexing(tmp_path):
    data = [
        {"relation_id": "P17", "target_id": "Q16",
         "samples": [{"name": "a", "text": "canada is a country"},
                     {"name": "b", "text": "toronto is in canada"}]},
        {"relation_id": "P17", "target_id": "Q30",
         "samples": [{"name": "c", "text": "the usa borders canada"}]},
    ]
    p = tmp_path / "attribute_snippets.json"
    p.write_text(json.dumps(data))
    snips = AttributeSnippets(str(p))
    assert len(snips["P17"]["Q16"]) == 2
    assert snips["P17"]["Q30"][0]["text"] == "the usa borders canada"
    assert snips["P99"]["Q1"] == []  # defaultdict semantics


def test_tfidf_rows_l2_normalized():
    corpus = ["the cat sat on the mat", "the dog ate the bone",
              "cats and dogs are pets"]
    vec = TfidfVectorizer()
    X = vec.fit_transform(corpus)
    norms = np.linalg.norm(X, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_tfidf_idf_downweights_common_terms():
    corpus = ["the cat", "the dog", "the bird"]
    vec = TfidfVectorizer().fit(corpus)
    # 'the' appears in every doc -> lowest idf
    assert vec.idf_[vec.vocabulary_["the"]] < vec.idf_[vec.vocabulary_["cat"]]


def test_consistency_prefers_on_topic_generations():
    snippets = ["canada is a country in north america",
                "the capital of canada is ottawa"]
    on_topic = ["canada is a large country", "ottawa is the capital"]
    off_topic = ["bananas are yellow fruit", "the piano has many keys"]
    assert (tfidf_consistency(on_topic, snippets)
            > tfidf_consistency(off_topic, snippets))
    assert tfidf_consistency([], snippets) == 0.0
