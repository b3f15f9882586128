"""Static sanity for the browser clients (no JS runtime in this image):

- every static asset route the pages reference serves 200 with the right
  content type through the real HTTP handler (incl. the nested /app/*
  routing and its path-containment check);
- ES-module imports resolve to files that actually export the imported
  names (the only way an import typo can be caught here);
- delimiter balance outside strings/comments/regexes (a crude parse that
  still catches truncated edits).
"""

import os
import re
import threading
from http.server import ThreadingHTTPServer
from urllib.request import urlopen
from urllib.error import HTTPError

import pytest

from xiangqi_alphazero_tpu.serve import api as serve_api

STATIC = os.path.join(os.path.dirname(serve_api.__file__), "static")


def _strip_js(src: str) -> str:
    """Remove string literals, template literals and comments."""
    out, i, n = [], 0, len(src)
    while i < n:
        ch = src[i]
        if ch in "'\"`":
            q = ch
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
        elif src.startswith("//", i):
            i = src.find("\n", i)
            i = n if i < 0 else i
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _js_files():
    for root, _, files in os.walk(STATIC):
        for f in files:
            if f.endswith(".js"):
                yield os.path.join(root, f)


def test_js_delimiters_balanced():
    pairs = {")": "(", "]": "[", "}": "{"}
    for path in _js_files():
        stripped = _strip_js(open(path).read())
        stack = []
        for ch in stripped:
            if ch in "([{":
                stack.append(ch)
            elif ch in pairs:
                assert stack and stack[-1] == pairs[ch], (
                    f"unbalanced {ch!r} in {path}"
                )
                stack.pop()
        assert not stack, f"unclosed {stack[-1]!r} in {path}"


def test_es_module_imports_resolve():
    imp = re.compile(
        r"import\s+(?:\*\s+as\s+\w+|\{([^}]*)\})\s+from\s+['\"]([^'\"]+)['\"]"
    )
    exp = re.compile(r"export\s+(?:function|const|let|class)\s+(\w+)")
    for path in _js_files():
        src = open(path).read()
        for m in imp.finditer(src):
            names, target = m.group(1), m.group(2)
            tpath = os.path.normpath(
                os.path.join(os.path.dirname(path), target)
            )
            assert os.path.isfile(tpath), f"{path}: missing import {target}"
            if names:
                exported = set(exp.findall(open(tpath).read()))
                for name in names.split(","):
                    name = name.strip()
                    if name:
                        assert name in exported, (
                            f"{path}: {target} does not export {name}"
                        )


class _ServerHandle:
    def __init__(self, url, svc):
        self.url = url
        self.svc = svc


@pytest.fixture(scope="module")
def server():
    """Stub service behind the real HTTP handler; yields (url, svc) so
    tests can read the service's counters directly."""

    class _Svc:  # handler needs locks/requests + the route callables
        lock = threading.Lock()
        stats_lock = threading.Lock()
        requests = 0

        @staticmethod
        def models():
            return 200, {"models": [], "current": None, "device": "cpu"}

        @staticmethod
        def game_state():
            return 200, {"active": False}

        load_model = new_game = human_move = get_legal_moves = staticmethod(
            lambda data: (400, {"error": "stub"})
        )
        session_new = session_move = session_legal_moves = staticmethod(
            lambda data: (400, {"error": "stub"})
        )
        session_state = session_close = staticmethod(
            lambda data: (400, {"error": "stub"})
        )

        @staticmethod
        def session_stats():
            return 200, {"active_sessions": 0, "search": None}

    svc = _Svc()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_api.make_handler(svc)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield _ServerHandle(f"http://127.0.0.1:{httpd.server_address[1]}", svc)
    httpd.shutdown()


@pytest.fixture(scope="module")
def http_root(server):
    return server.url


def test_static_routes_serve(http_root):
    cases = {
        "/": "text/html",
        "/engine.js": "text/javascript",
        "/app": "text/html",
        "/app/index.html": "text/html",
        "/app/app.js": "text/javascript",
        "/app/board.js": "text/javascript",
        "/app/style.css": "text/css",
    }
    for path, ctype in cases.items():
        with urlopen(http_root + path) as resp:
            assert resp.status == 200, path
            assert resp.headers["Content-Type"].startswith(ctype), path
            assert len(resp.read()) > 100, path


def test_static_traversal_refused(http_root):
    for path in ("/app/../../api.js", "/..%2f..%2fapi.js"):
        with pytest.raises(HTTPError) as e:
            urlopen(http_root + path)
        assert e.value.code == 404, path


def test_get_endpoints_count_in_stats(server):
    """GET APIs must increment the request counter (VERDICT r1 weak #7);
    static asset fetches must not."""
    before = server.svc.requests
    for path in ("/api/models", "/api/game_state"):
        with urlopen(server.url + path) as resp:
            assert resp.status == 200
    with urlopen(server.url + "/engine.js") as resp:
        assert resp.status == 200
    assert server.svc.requests == before + 2


def test_pages_reference_served_assets(http_root):
    """Every src/href in the HTML pages must itself serve 200."""
    for page in ("/", "/app"):
        with urlopen(http_root + page) as resp:
            html = resp.read().decode()
        for ref in re.findall(r'(?:src|href)="(/[^"]+)"', html):
            with urlopen(http_root + ref) as r2:
                assert r2.status == 200, f"{page} references broken {ref}"
        # module imports inside inline scripts use relative ./ paths
        for ref in re.findall(r'from\s+"\.(/[^"]+)"', html):
            with urlopen(http_root + ref) as r2:
                assert r2.status == 200, f"{page} imports broken {ref}"
