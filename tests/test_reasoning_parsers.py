"""Model-specific reasoning parsers (reference: vllm/reasoning/ —
deepseek_r1 / qwen3 / granite / hunyuan_a13b extractors)."""

from vllm_tpu.reasoning import (StreamingReasoningSplitter,
                                get_reasoning_parser,
                                list_reasoning_parsers)


def test_r1_opening_tag_optional():
    p = get_reasoning_parser("deepseek_r1")
    r = p.extract("thoughts here</think>the answer")
    assert r.reasoning_content == "thoughts here"
    assert r.content == "the answer"


def test_qwen3_requires_both_tags():
    p = get_reasoning_parser("qwen3")
    # enable_thinking=False: no think block at all -> pure content
    r = p.extract("no thinking here")
    assert r.reasoning_content is None
    assert r.content == "no thinking here"
    r = p.extract("<think>hmm</think>yes")
    assert r.reasoning_content == "hmm"
    assert r.content == "yes"
    # R1 would treat this as reasoning; qwen3 must not
    r = p.extract("stray</think>tail")
    assert r.reasoning_content is None


def test_qwen3_streaming_without_think_is_content():
    p = get_reasoning_parser("qwen3")
    s = StreamingReasoningSplitter(p)
    outs = [s.push(d) for d in ["hel", "lo wor", "ld"]]
    outs.append(s.finish())
    assert "".join(c for _, c in outs) == "hello world"
    assert "".join(r for r, _ in outs) == ""


def test_qwen3_streaming_with_think():
    p = get_reasoning_parser("qwen3")
    s = StreamingReasoningSplitter(p)
    outs = [s.push(d) for d in ["<think>a", "b</th", "ink>done"]]
    outs.append(s.finish())
    assert "".join(r for r, _ in outs) == "ab"
    assert "".join(c for _, c in outs) == "done"


def test_granite_markers():
    g = get_reasoning_parser("granite")
    r = g.extract("Here is my thought process: t1 t2 "
                  "Here is my response: final")
    assert r.reasoning_content == "t1 t2"
    assert r.content == "final"
    # "Here's" variant + unterminated thought
    r = g.extract("Here's my thought process: xx")
    assert r.reasoning_content == "xx"
    assert r.content is None
    r = g.extract("plain text")
    assert r.reasoning_content is None
    assert r.content == "plain text"


def test_hunyuan_answer_tags():
    h = get_reasoning_parser("hunyuan_a13b")
    r = h.extract("<think>deep</think>\n<answer>42</answer>")
    assert r.reasoning_content == "deep"
    assert r.content == "42"
    r = h.extract("<think>deep</think>bare tail")
    assert r.content == "bare tail"


def test_registry_lists_all():
    names = list_reasoning_parsers()
    for n in ("deepseek_r1", "qwen3", "glm45", "granite",
              "hunyuan_a13b"):
        assert n in names
