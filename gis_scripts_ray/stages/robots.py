"""robots.txt politeness filtering — the crawl-hygiene gate that
decides, per (host, path), whether a corpus may keep a fetched page
(RFC 9309). The deterministic core implemented here:

* **group selection** — the group whose ``User-agent`` line equals the
  crawler's token (case-insensitive) wins; otherwise the ``*`` group;
  a group can have several user-agent lines.
* **rule matching** — ``Allow`` / ``Disallow`` values match from the
  START of the path; ``*`` matches any octet run; a trailing ``$``
  anchors the end. Empty-value rules are ignored (an empty Disallow
  is "allow all" per the RFC).
* **precedence** — the most specific match (most octets in the rule
  value) wins; at equal length Allow wins; no match ⇒ allowed.

Scale shape: the robots corpus is O(hosts) and tiny next to the page
table (one small text per origin), so delivery is the broadcast idiom
— ``ray.put`` the host→body dict ONCE, each actor fetches and
lazily compiles per-host rule automata in ``__init__``-owned caches;
pages stream through ``map_batches``. Rule evaluation is vectorized:
each rule is one RE2 ``match_substring_regex`` over the batch's path
column (per distinct host), not a per-row Python loop.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def parse_robots(body: str, agent: str) -> list[tuple[bool, str]]:
    """Rules [(is_allow, pattern), ...] of the group governing
    ``agent``: the exact-token group when present, else the ``*``
    group, else no rules. Unknown directives are skipped; user-agent
    lines not separated by rules stack onto one group."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:
                rules.append((key == "allow", val))
    if agents or rules:
        groups.append((agents, rules))
    tok = agent.lower()
    star: list[tuple[bool, str]] = []
    for agents_, rules_ in groups:
        if tok in agents_:
            return rules_
        if "*" in agents_:
            star = rules_
    return star


def _rule_regex(pattern: str) -> str:
    """RFC 9309 value → anchored RE2: escape everything, ``*`` → .*,
    trailing ``$`` → end anchor."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(seg) for seg in core.split("*"))
    return rx + "$" if anchored else rx


def path_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Per-row reference evaluator (the parity oracle for the
    vectorized stage): longest matched rule wins, Allow wins ties,
    no match ⇒ allowed."""
    best_len, verdict = -1, True
    for is_allow, pattern in rules:
        if re.match(_rule_regex(pattern), path):
            n = len(pattern)
            if n > best_len or (n == best_len and is_allow):
                best_len, verdict = n, is_allow
    return verdict


class RobotsFilterStage:
    """Adds ``allowed:bool`` per row from a broadcast host→robots-body
    dict. Hosts with no robots body allow everything (the 404
    convention). Rule automata compile once per (actor, host)."""

    def __init__(self, robots_ref, agent: str, host_col: str, path_col: str):
        self.bodies: dict[str, str] = ray.get(robots_ref)
        self.agent = agent
        self.host_col = host_col
        self.path_col = path_col
        self._compiled: dict[str, list[tuple[bool, str, int]]] = {}

    def _rules_for(self, host: str) -> list[tuple[bool, str, int]]:
        got = self._compiled.get(host)
        if got is None:
            body = self.bodies.get(host)
            got = (
                []
                if body is None
                else [
                    (is_allow, _rule_regex(patt), len(patt))
                    for is_allow, patt in parse_robots(body, self.agent)
                ]
            )
            self._compiled[host] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch[self.host_col].to_numpy(zero_copy_only=False)
        n = len(batch)
        allowed = np.ones(n, bool)
        for host in np.unique(hosts) if n else []:
            rules = self._rules_for(str(host))
            if not rules:
                continue
            idx = np.flatnonzero(hosts == host)
            paths = pc.take(batch[self.path_col], pa.array(idx))
            best = np.full(len(idx), -1, np.int64)
            verdict = np.ones(len(idx), bool)
            for is_allow, rx, plen in rules:
                m = pc.fill_null(
                    pc.match_substring_regex(paths, rx), False
                ).to_numpy(zero_copy_only=False)
                m = np.asarray(m, bool)
                take = m & ((plen > best) | ((plen == best) & is_allow))
                verdict = np.where(take, is_allow, verdict)
                best = np.where(m & (plen > best), plen, best)
            allowed[idx] = verdict
        out = batch.append_column("allowed", pa.array(allowed, pa.bool_()))
        return out


def robots_filter(
    ds: ray.data.Dataset,
    robots_by_host: "dict[str, str] | ray.ObjectRef",
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
    concurrency: "int | tuple[int, int]" = 4,
) -> ray.data.Dataset:
    """Annotate rows with robots ``allowed`` (broadcast robots side)."""
    ref = (
        robots_by_host
        if isinstance(robots_by_host, ray.ObjectRef)
        else ray.put(robots_by_host)
    )
    return ds.map_batches(
        RobotsFilterStage,
        fn_constructor_kwargs={
            "robots_ref": ref,
            "agent": agent,
            "host_col": host_col,
            "path_col": path_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )
