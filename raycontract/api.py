"""Minimal REST API for the validation engine.

≅ the reference's ``api.py`` (FastAPI ``POST /test``, ``POST /lint``,
``POST /export`` with ``x-api-key`` header auth) re-expressed on the stdlib
``http.server`` (FastAPI/uvicorn are unavailable offline). The request body
is the contract YAML; responses are JSON. Auth: if ``RAYCONTRACT_API_KEY``
is set, requests must carry it in the ``x-api-key`` header (same convention
as the reference's DATACONTRACT_CLI_API_KEY, ``api.py:93-110``).

Run: ``python -m raycontract.api [port]`` (Ray must be initialised by the
caller or it auto-initialises on first /test).
"""

from __future__ import annotations

import hmac
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class _Handler(BaseHTTPRequestHandler):
    server_version = "raycontract-api/1"

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("RAYCONTRACT_API_LOG"):
            super().log_message(fmt, *args)

    def _send(self, code: int, payload, content_type="application/json"):
        body = (json.dumps(payload, indent=2) if content_type == "application/json"
                else payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _check_key(self) -> bool:
        want = os.environ.get("RAYCONTRACT_API_KEY")
        if not want:
            return True
        got = self.headers.get("x-api-key")
        # constant-time compare + one indistinguishable 401 for missing AND
        # wrong keys (no timing / status side channel on the header value)
        if not hmac.compare_digest((got or "").encode(), want.encode()):
            self._send(401, {"detail": "invalid or missing x-api-key"})
            return False
        return True

    def _body(self) -> str:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n).decode("utf-8", "replace")

    def do_POST(self):  # noqa: N802 (stdlib naming)
        if not self._check_key():
            return
        url = urlparse(self.path)
        route = url.path.rstrip("/")
        try:
            if route == "/test":
                self._test(url)
            elif route == "/lint":
                self._lint()
            elif route == "/export":
                self._export(url)
            else:
                self._send(404, {"detail": f"unknown route {route!r}"})
        except Exception as e:
            self._send(422, {"detail": str(e)})

    def _test(self, url):
        from raycontract.contract import DataContract
        from raycontract.output import run_to_json

        qs = parse_qs(url.query)
        server = (qs.get("server") or [None])[0]
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        run = DataContract(data_contract_str=self._body(), server=server).test()
        self._send(200, json.loads(run_to_json(run)))

    def _lint(self):
        from raycontract.contract import DataContract
        from raycontract.output import run_to_json

        run = DataContract(data_contract_str=self._body()).lint()
        self._send(200, json.loads(run_to_json(run)))

    def _export(self, url):
        from raycontract.cli import render_export
        from raycontract.contract import DataContractSpecification

        qs = parse_qs(url.query)
        fmt = (qs.get("format") or ["jsonschema"])[0]
        spec = DataContractSpecification.from_string(self._body())
        out = render_export(spec, fmt,
                            model=(qs.get("model") or [None])[0],
                            dialect=(qs.get("dialect") or [None])[0])
        self._send(200, {"format": fmt, "result": out})


def serve(port: int = 4242) -> ThreadingHTTPServer:
    """Start the API (non-blocking helper for tests: call ``.serve_forever``
    in a thread, ``.shutdown()`` to stop)."""
    return ThreadingHTTPServer(("127.0.0.1", port), _Handler)


def main(argv=None) -> int:
    import sys

    port = int((argv or sys.argv[1:] or ["4242"])[0])
    httpd = serve(port)
    print(f"raycontract api listening on 127.0.0.1:{port} "
          f"(auth: {'x-api-key' if os.environ.get('RAYCONTRACT_API_KEY') else 'off'})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
