"""robots.txt politeness filtering (stages/robots.py)."""

import numpy as np
import pyarrow as pa
import ray

from gis_scripts_ray.stages.robots import (
    RobotsFilterStage,
    parse_robots,
    path_allowed,
)

BODY = (
    "# comment\n"
    "User-agent: badbot\nDisallow: /\n\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow: /*.pdf$\n"
    "Disallow: /tmp*\n"
)


class TestParse:
    def test_group_selection(self):
        # exact-token group wins over *
        assert parse_robots(BODY, "badbot") == [(False, "/")]
        # unknown agent falls to the * group
        rules = parse_robots(BODY, "graftbot")
        assert (False, "/private") in rules and (True, "/private/ok") in rules

    def test_stacked_agents_and_empty_value(self):
        b = "User-agent: a\nUser-agent: b\nDisallow: /x\nDisallow:\n"
        assert parse_robots(b, "B") == [(False, "/x")]  # case-insensitive
        assert parse_robots(b, "c") == []  # no * group

    def test_new_group_after_rules(self):
        b = "User-agent: *\nDisallow: /a\nUser-agent: z\nDisallow: /b\n"
        assert parse_robots(b, "z") == [(False, "/b")]
        assert parse_robots(b, "other") == [(False, "/a")]


class TestPrecedence:
    RULES = parse_robots(BODY, "*")

    def test_longest_match_wins(self):
        assert not path_allowed(self.RULES, "/private/p1")
        assert path_allowed(self.RULES, "/private/ok9")  # longer Allow

    def test_anchors_and_wildcards(self):
        assert not path_allowed(self.RULES, "/a/b.pdf")
        assert path_allowed(self.RULES, "/a/b.pdfx")  # $ must not match
        assert not path_allowed(self.RULES, "/tmpfile")
        assert path_allowed(self.RULES, "/public/x")  # no match => allowed

    def test_allow_wins_ties(self):
        rules = [(False, "/a/b"), (True, "/a/c")]
        # equal-length allow vs disallow on a path matching both shapes
        tie = [(False, "/d*"), (True, "/d*")]
        assert path_allowed(tie, "/dx")
        assert not path_allowed(rules, "/a/b")


class TestStageParity:
    def test_vectorized_matches_reference_on_hostile_grid(self, ray_session):
        rng = np.random.default_rng(7)
        hosts_pool = [f"h{i}.test" for i in range(5)]
        bodies = {
            "h0.test": BODY,
            "h1.test": "User-agent: *\nAllow: /\nDisallow: /x*y$\n",
            "h2.test": "",  # empty body => * group absent => allow all
            # h3.test has NO robots entry => allow all
            "h4.test": "User-agent: graftbot\nDisallow: /g\nUser-agent: *\nDisallow: /\n",
        }
        segs = ["", "/x", "/xay", "/private", "/private/ok", "/tmp", "/g",
                "/doc.pdf", "/doc.pdfx", "/a/b.pdf", "/y"]
        n = 400
        hosts = [hosts_pool[i] for i in rng.integers(0, 5, n)]
        paths = [
            segs[i] + segs[j]
            for i, j in zip(rng.integers(0, len(segs), n),
                            rng.integers(0, len(segs), n))
        ]
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )
        stage = RobotsFilterStage(ray.put(bodies), "graftbot", "host", "path")
        got = stage(t)["allowed"].to_pylist()
        expect = [
            path_allowed(parse_robots(bodies.get(h, ""), "graftbot"), p)
            for h, p in zip(hosts, paths)
        ]
        assert got == expect

    def test_empty_batch(self, ray_session):
        t = pa.table(
            {"host": pa.array([], pa.string()), "path": pa.array([], pa.string())}
        )
        stage = RobotsFilterStage(ray.put({}), "x", "host", "path")
        assert len(stage(t)) == 0
