

def test_preprocess_plain():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fake_tokenizer import FakeTokenizer

    from showo_tpu.data.llava import IGNORE_INDEX, preprocess_plain

    tok = FakeTokenizer()

    class Tok:
        eos_token_id = 2

        def __call__(self, text, **kw):
            return {"input_ids": tok(text)["input_ids"][0] if text else []}

    src = [{"from": "human", "value": "<image>\ndescribe"},
           {"from": "gpt", "value": "a small dog"}]
    ids, labels = preprocess_plain(src, Tok())
    assert ids[-1] == 2  # eos appended
    assert len(ids) == len(labels)
    # empty prompt -> no masked positions; caption tokens are targets
    assert (labels != IGNORE_INDEX).all()
