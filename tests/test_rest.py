"""REST adapter tests mirroring the reference's API-layer suite
(tests/test_geckoterminal_etls.py:79-312): success, 429-then-success
with backoff timing, retries exhausted, non-retryable statuses."""

import pytest

from etl_pipelines_spark.sources.rest import (
    RetriesExhausted,
    fetch_distributed,
    fetch_with_backoff,
    land_records,
    paginated_records,
)


class Script:
    """Scripted fetch: returns queued (status, payload) responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = 0

    def __call__(self, url):
        self.calls += 1
        return self.responses.pop(0)


def test_success_first_try():
    fetch = Script([(200, {"ok": 1})])
    assert fetch_with_backoff(fetch, "u", sleep=lambda s: None) == {"ok": 1}
    assert fetch.calls == 1


def test_429_then_success_backs_off_exponentially():
    fetch = Script([(429, None), (429, None), (200, "data")])
    sleeps = []
    got = fetch_with_backoff(fetch, "u", sleep=sleeps.append)
    assert got == "data"
    assert sleeps == [1.0, 2.0]  # base * 2^attempt


def test_backoff_caps_at_max_delay():
    fetch = Script([(503, None)] * 7 + [(200, "x")])
    sleeps = []
    with pytest.raises(RetriesExhausted):
        fetch_with_backoff(fetch, "u", max_retries=6, sleep=sleeps.append)
    assert sleeps == [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]  # capped at 32


def test_retries_exhausted_raises_with_status():
    fetch = Script([(429, None)] * 6)
    with pytest.raises(RetriesExhausted) as e:
        fetch_with_backoff(fetch, "u", max_retries=5, sleep=lambda s: None)
    assert e.value.last_status == 429
    assert fetch.calls == 6


def test_non_retryable_raises_immediately():
    fetch = Script([(404, None)])
    with pytest.raises(RuntimeError, match="404"):
        fetch_with_backoff(fetch, "u", sleep=lambda s: None)
    assert fetch.calls == 1


def test_pagination_until_empty_page():
    pages = {1: [{"id": 1}, {"id": 2}], 2: [{"id": 3}], 3: []}
    fetch = lambda url: (200, pages[int(url.split("=")[1])])
    got = list(paginated_records(fetch, lambda p: f"u?page={p}"))
    assert [r["id"] for r in got] == [1, 2, 3]


def test_land_records_explicit_schema(spark):
    df = land_records(spark, [{"id": 1, "name": "a"}], "id long, name string")
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"
    assert df.count() == 1


# ------------------------------------------------------------------
# executor-side fan-out (fetch_distributed): must land the identical
# frame the driver path lands, through the same injected transport —
# including backoff retries running INSIDE the tasks.


def _make_transport():
    """Transport factory: per-coin market rows, with one URL that needs
    two 429 retries before succeeding. Returned as a CLOSURE so
    cloudpickle ships it to executors by value (a module-level test
    function would pickle by reference and fail to import in the
    Python workers); the retry state rides in the closure dict, which
    is task-local — exactly where fetch_with_backoff loops."""
    flaky = {"calls": 0}

    def transport(url):
        coin = int(url.rsplit("/", 1)[1].split("?")[0])
        if coin == 3:
            flaky["calls"] += 1
            if flaky["calls"] <= 2:
                return (429, None)
        if coin == 5:
            return (200, [])  # entity with no rows
        return (
            200,
            [
                {"date": f"2024-01-0{d}", "price": float(coin * 10 + d)}
                for d in range(1, 4)
            ],
        )

    return transport


def test_fetch_distributed_matches_driver_path(spark):
    urls = spark.createDataFrame(
        [(c, f"https://api.example/coins/{c}?vs=usd") for c in range(1, 7)],
        "coin_id long, url string",
    )
    got = fetch_distributed(
        urls,
        _make_transport(),
        "date string, price double",
        passthrough_cols=["coin_id"],
        num_slots=4,
        base_delay=0.0,  # executor-side sleeps: keep the test fast
    )
    assert got.schema.simpleString() == (
        "struct<coin_id:bigint,date:string,price:double>"
    )
    # driver path over the same transport/URLs (fresh flaky counter)
    driver_transport = _make_transport()
    records = []
    for c in range(1, 7):
        payload = fetch_with_backoff(
            driver_transport, f"https://api.example/coins/{c}?vs=usd",
            base_delay=0.0,
        )
        records.extend({"coin_id": c, **r} for r in payload or [])
    want = land_records(spark, records, "coin_id long, date string, price double")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 15  # 5 coins x 3 rows, coin 5 empty


class _LocalApi:
    """In-process httpd fixture: JSON pages + a flaky endpoint that
    429s twice before succeeding — the smallest real server the
    default transport can be proven against."""

    def __enter__(self):
        import http.server
        import json
        import threading

        flaky_calls = {"n": 0}

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/page/"):
                    page = int(self.path.rsplit("/", 1)[1])
                    body = (
                        [{"id": page * 10 + i} for i in range(2)]
                        if page <= 2
                        else []
                    )
                    code = 200
                elif self.path == "/flaky":
                    flaky_calls["n"] += 1
                    if flaky_calls["n"] <= 2:
                        self.send_response(429)
                        self.end_headers()
                        return
                    body, code = {"ok": True, "tries": flaky_calls["n"]}, 200
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                payload = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()


def test_urllib_transport_against_local_httpd():
    """The default REAL transport end-to-end: pagination walks JSON
    pages off a live local server; 429s surface as statuses so the
    shared backoff loop retries them."""
    from etl_pipelines_spark.sources.rest import urllib_transport

    with _LocalApi() as api:
        base = f"http://127.0.0.1:{api.port}"
        fetch = urllib_transport(timeout=5.0)
        got = list(
            paginated_records(fetch, lambda p: f"{base}/page/{p}")
        )
        assert [r["id"] for r in got] == [10, 11, 20, 21]
        flaky = fetch_with_backoff(fetch, f"{base}/flaky", base_delay=0.0)
        assert flaky == {"ok": True, "tries": 3}
        with pytest.raises(RuntimeError, match="404"):
            fetch_with_backoff(fetch, f"{base}/nope", base_delay=0.0)


def test_urllib_transport_distributed_against_local_httpd(spark):
    """fetch_distributed over the default transport: the callable
    pickles into the Python workers and fetches from the local server
    inside tasks — the full production wiring minus only the remote
    host."""
    from etl_pipelines_spark.sources.rest import urllib_transport

    with _LocalApi() as api:
        base = f"http://127.0.0.1:{api.port}"
        urls = spark.createDataFrame(
            [(p, f"{base}/page/{p}") for p in (1, 2, 3)],
            "page long, url string",
        )
        got = fetch_distributed(
            urls,
            urllib_transport(timeout=5.0),
            "id long",
            passthrough_cols=["page"],
            num_slots=2,
            base_delay=0.0,
        )
        rows = sorted((r["page"], r["id"]) for r in got.collect())
        assert rows == [(1, 10), (1, 11), (2, 20), (2, 21)]


def test_urllib_transport_ssl_cert_failure_is_non_retryable(monkeypatch):
    """A certificate verification failure is hopeless, not transient:
    the transport maps it to non-retryable 495 carrying the cause, so
    fetch_with_backoff fails on the FIRST attempt naming the SSL
    error instead of burning the whole backoff schedule and
    misreporting a 503 (round-10 advice)."""
    import ssl
    import urllib.error
    import urllib.request

    from etl_pipelines_spark.sources.rest import urllib_transport

    calls = {"n": 0}

    def bad_open(req, timeout=None):
        calls["n"] += 1
        raise urllib.error.URLError(
            ssl.SSLCertVerificationError(1, "certificate verify failed")
        )

    monkeypatch.setattr(urllib.request, "urlopen", bad_open)
    fetch = urllib_transport()
    status, payload = fetch("https://example.invalid/x")
    assert status == 495
    assert "certificate verify failed" in payload["_transport_error"]
    with pytest.raises(RuntimeError, match="495.*certificate verify failed"):
        fetch_with_backoff(fetch, "https://example.invalid/x", base_delay=0.0)
    assert calls["n"] == 2  # direct probe + ONE backoff-loop attempt


def test_urllib_transport_network_fault_detail_reaches_exhaustion(monkeypatch):
    """Transient network faults stay retryable 503s, but the cause
    text now rides along so RetriesExhausted names the real failure
    (DNS here) instead of a bare pseudo-status."""
    import urllib.error
    import urllib.request

    from etl_pipelines_spark.sources.rest import RetriesExhausted, urllib_transport

    def dns_fail(req, timeout=None):
        raise urllib.error.URLError(OSError("Name or service not known"))

    monkeypatch.setattr(urllib.request, "urlopen", dns_fail)
    fetch = urllib_transport()
    with pytest.raises(RetriesExhausted) as ei:
        fetch_with_backoff(
            fetch, "http://nope.invalid/", max_retries=2, base_delay=0.0
        )
    assert ei.value.last_status == 503
    assert "Name or service not known" in str(ei.value)


def test_fetch_distributed_fails_loud_on_exhausted_retries(spark):
    urls = spark.createDataFrame(
        [(1, "u/1"), (2, "u/2")], "coin_id long, url string"
    )

    def always_429(url):
        return (429, None)

    bad = fetch_distributed(
        urls, always_429, "date string", max_retries=1, base_delay=0.0
    )
    with pytest.raises(Exception, match="attempts|429"):
        bad.collect()
