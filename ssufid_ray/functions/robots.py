"""robots.txt gating (north-rule component).

The reference has no robots handling (it crawls known university boards);
the north rule requires a robots gate in the frontier. We parse with the
stdlib RobotFileParser, cached once per host inside the scout (SURVEY §2.5
T4 analogue: per-host session state built once)."""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

USER_AGENT = "ssufid-ray"


def parse_robots(body: bytes | None) -> RobotFileParser:
    rp = RobotFileParser()
    if body is None:
        rp.parse([])  # no robots.txt -> allow all
    else:
        rp.parse(body.decode("utf-8", errors="replace").splitlines())
    return rp


def allowed(rp: RobotFileParser, url: str) -> bool:
    return rp.can_fetch(USER_AGENT, url)


def crawl_delay_ms(rp: RobotFileParser) -> int:
    """Robots Crawl-delay in ms (0 when absent). The effective per-host
    politeness is max(board politeness_ms, robots crawl-delay)."""
    d = rp.crawl_delay(USER_AGENT)
    return int(d * 1000) if d else 0
