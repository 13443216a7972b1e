"""RFC 9309 robots engine over handcrafted files — cases drawn from the
spec's own examples (longest match, Allow tie-break, group selection,
wildcards/anchors, empty values, merged groups)."""

from ocrs_spark.robots import is_allowed, parse_robots


def test_longest_match_wins_and_allow_tie_break():
    # RFC 9309 §2.2.2 example: /example/page vs the longer allow
    r = "User-agent: *\nAllow: /example/page/\nDisallow: /example/\n"
    assert not is_allowed(r, "anybot", "/example/other")
    assert is_allowed(r, "anybot", "/example/page/")
    # exact tie: Allow wins
    tie = "User-agent: *\nAllow: /page\nDisallow: /page\n"
    assert is_allowed(tie, "anybot", "/page")


def test_group_selection_specificity():
    r = (
        "User-agent: googlebot-news\nDisallow: /news\n\n"
        "User-agent: googlebot\nDisallow: /general\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # longest matching prefix of the product token wins
    assert not is_allowed(r, "googlebot-news", "/news")
    assert is_allowed(r, "googlebot-news", "/general")  # its group only
    assert not is_allowed(r, "googlebot", "/general")
    assert is_allowed(r, "googlebot", "/news")
    # unknown bot falls to *
    assert not is_allowed(r, "otherbot", "/anything")


def test_wildcards_and_anchor():
    r = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /private*/x\n"
    assert not is_allowed(r, "bot", "/a/b/c.pdf")
    assert is_allowed(r, "bot", "/a/b/c.pdf?x=1")  # $ anchor: query breaks it
    assert not is_allowed(r, "bot", "/private-stuff/x")
    assert is_allowed(r, "bot", "/private-stuff/y")


def test_empty_values_and_defaults():
    # empty Disallow matches nothing -> everything allowed
    assert is_allowed("User-agent: *\nDisallow:\n", "bot", "/any")
    # no matching group at all -> allowed
    assert is_allowed("User-agent: special\nDisallow: /\n", "bot", "/any")
    # empty file -> allowed
    assert is_allowed("", "bot", "/any")
    # comments and junk lines ignored
    r = "# hi\nUser-agent: * # inline\nDisallow: /x # comment\nnonsense\n"
    assert not is_allowed(r, "bot", "/x")
    assert is_allowed(r, "bot", "/y")


def test_consecutive_agents_share_group_and_merged_groups():
    r = (
        "User-agent: alpha\nUser-agent: beta\nDisallow: /shared\n\n"
        "User-agent: alpha\nDisallow: /extra\n"
    )
    # both agents get the shared rule
    assert not is_allowed(r, "alpha", "/shared")
    assert not is_allowed(r, "beta", "/shared")
    # alpha's two same-specificity groups merge (RFC 9309 §2.2.1)
    assert not is_allowed(r, "alpha", "/extra")
    assert is_allowed(r, "beta", "/extra")


def test_rules_before_any_group_are_ignored():
    r = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    assert is_allowed(r, "bot", "/orphan")
    assert not is_allowed(r, "bot", "/real")


def test_case_insensitive_directives_and_agents():
    r = "USER-AGENT: OcrsBot\nDISALLOW: /x\n"
    parsed = parse_robots(r)
    assert not parsed.is_allowed("ocrsbot-v2", "/x")
    assert parsed.is_allowed("otherbot", "/x")
