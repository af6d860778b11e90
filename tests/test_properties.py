"""Property-based tests (hypothesis): simulator cross-validation and
tokenizer robustness. These run pure-Python (no Spark) — the FIFO model is
the ground truth the Spark engine is separately tested against."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from owlfrontier.extract import extract_full, extract_page, page_structure_json
from owlfrontier.simulate import simulate_fifo, simulate_generations
from owlfrontier.urlutil import host_of


# --- random site graphs --------------------------------------------------


@st.composite
def sites(draw):
    n_hosts = draw(st.integers(1, 4))
    pages_per_host = draw(st.integers(1, 6))
    hosts = [f"h{i}.example" for i in range(n_hosts)]
    urls = [f"http://{h}/p{j}" for h in hosts for j in range(pages_per_host)]
    pages = {}
    for u in urls:
        n_links = draw(st.integers(0, 4))
        anchors = []
        for _ in range(n_links):
            tgt = draw(st.sampled_from(urls + ["http://missing.example/x"]))
            host, path = tgt.split("//")[1].split("/", 1)
            style = draw(st.sampled_from(["root", "proto", "abs"]))
            if style == "root" and host == u.split("//")[1].split("/")[0]:
                href = "/" + path
            elif style == "proto":
                href = "//" + host + "/" + path
            else:
                href = tgt  # absolute: store-only, never followed
            anchors.append(f'<a href="{href}">x</a>')
        pages[u] = f"<title>{u}</title><p>body</p>" + "".join(anchors)
    seeds = draw(
        st.lists(st.sampled_from(urls), min_size=1, max_size=3)
    )
    return pages, seeds


@given(sites())
@settings(max_examples=60, deadline=None)
def test_generational_model_equals_fifo_when_unbounded(site):
    pages, seeds = site
    fifo = simulate_fifo(pages, seeds)
    gen = simulate_generations(pages, seeds)
    assert [u for _, _, u in gen.crawl_order] == fifo
    assert gen.url_seen == set(fifo)


@given(sites(), st.integers(1, 3))
@settings(max_examples=60, deadline=None)
def test_politeness_preserves_seen_set_and_respects_budget(site, k):
    pages, seeds = site
    unbounded = simulate_generations(pages, seeds)
    budgeted = simulate_generations(pages, seeds, politeness_k=k,
                                    max_generations=500)
    # deferral changes WHEN, never WHETHER (SURVEY.md §3.4)
    assert budgeted.url_seen == unbounded.url_seen
    per_gen_host = {}
    for _, gen, url in budgeted.crawl_order:
        key = (gen, host_of(url))
        per_gen_host[key] = per_gen_host.get(key, 0) + 1
    assert all(v <= k for v in per_gen_host.values())
    # crawl order within the seen set is still deterministic + gap-free
    seqs = [s for s, _, _ in budgeted.crawl_order]
    assert seqs == list(range(len(seqs)))


# --- tokenizer fuzz --------------------------------------------------------

_html_alphabet = (
    string.ascii_letters + string.digits + "<>/=&#;'\"! -\t\n\r\f\x00\xff"
    + "€日本語 "
)


@given(
    st.text(alphabet=_html_alphabet, max_size=300),
    st.sampled_from([
        "", "<", "</", "</a", "<a", "<!", "<!-", "<!--", "<a href",
        "<script>", "<script><!--", "<script><!--<script>",
        "<script><!--<script>--", "<title>", "&#x1",
    ]),
)
@settings(max_examples=300, deadline=None)
def test_tokenizer_never_crashes_and_output_serializes(payload, suffix):
    # the suffix forces EOF-mid-construct states random text rarely hits
    payload = payload + suffix
    page = extract_page(payload, "http://fuzz.example/p")
    j = page_structure_json(page)
    assert j.startswith("{") and j.endswith("}")
    # every extracted link either resolves or is stored verbatim
    for link in page["links_candidate"]:
        assert link.startswith("http://fuzz.example") or link.startswith("http:")


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_arbitrary_bytes_roundtrip_to_valid_utf8_json(data):
    rec = extract_full(data, "http://fuzz.example/p")
    # the byte-identity column must always be valid UTF-8 (Arrow contract)
    rec["text_json"].encode("utf-8")
    for v in rec["text"]:
        v.encode("utf-8")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_robots_parser_total_on_arbitrary_text(txt):
    """robots.txt parsing is total: any text yields a (possibly empty)
    prefix list and an optional non-negative-able delay without raising;
    prefixes always come from Disallow lines of the text itself."""
    from owlfrontier.robots import parse_crawl_delay, parse_disallows

    dis = parse_disallows(txt)
    assert isinstance(dis, list)
    for d in dis:
        assert d and d in txt
    delay = parse_crawl_delay(txt)
    assert delay is None or isinstance(delay, float)
