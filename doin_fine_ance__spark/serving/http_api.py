"""HTTP serving adapter — the engine's twin of the reference's FastAPI
backend (`ui/backend/api/transactions.py:38-62`, `categories.py:34-41`,
`control_center.py`), with zero web-framework dependencies: a stdlib
``ThreadingHTTPServer`` routes requests into the same serving-layer
functions the query inventory tests (`serving/transactions.py`,
`serving/validated.py`, `serving/categories.py`,
`serving/control_center.py`).

Scope note: this is the *interactive* read/override surface — small
result pages over materialized marts, single-row or small-batch
override writes. The Spark work per request is a filter + top-k page
on a cached overlay DataFrame; the HTTP layer only translates query
strings and JSON bodies. Swapping in FastAPI/uvicorn is a handler
rename, not a redesign.

Routes (mirroring the reference paths):

  GET  /api/transactions                      list + total_count
  GET  /api/transactions/categories/list      distinct predicted cats
  GET  /api/transactions/{id}                 single transaction
  POST /api/transactions/{id}/categorize      override upsert
  PUT  /api/transactions/{id}/validate        validated flag
  PUT  /api/transactions/{id}/notes           notes
  PUT  /api/transactions/{id}/exclude-from-forecast
  POST /api/transactions/bulk-validate        one keyed merge
  GET  /api/validated                         validated list + count
  GET  /api/validated/categories/list         distinct validated cats
  GET  /api/categories                        active catalog names
  GET  /api/control-center/connection-health  health rollup
  GET  /api/model-metrics/metrics/history     registry metrics view
  GET  /api/model-metrics/training-status     latest registry row
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession


def _jsonable(v):
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (dt.date, dt.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows(df) -> list[dict]:
    if isinstance(df, list):  # pre-collected single-job page
        return [
            {k: _jsonable(v) for k, v in
             (r if isinstance(r, dict) else r.asDict()).items()}
            for r in df
        ]
    return [{k: _jsonable(v) for k, v in r.asDict().items()} for r in df.collect()]


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class ServingApp:
    """Route table + overlay cache over a warehouse root.

    The overlay (marts ⟕ user overrides) is built lazily and cached
    between requests; any write invalidates it — the same
    read-your-writes contract the reference gets from querying
    Postgres views per request, without re-running the join chain
    when nothing changed.
    """

    def __init__(self, spark: SparkSession, warehouse_root: str):
        from ..plans.build import Warehouse

        self.spark = spark
        self.wh = Warehouse(spark, warehouse_root)
        self._overlay = None
        self._lock = threading.Lock()

    # -- data access -------------------------------------------------

    def overlay(self):
        from .transactions import transaction_overlay

        with self._lock:
            if self._overlay is None:
                self._overlay = transaction_overlay(
                    self.wh.read("analytics", "fct_trxns_with_predictions"),
                    self._user_categories(),
                ).cache()
            return self._overlay

    def _user_categories(self):
        import os

        path = self.wh.path("public", "user_categories")
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        from ..schemas import USER_CATEGORIES

        return self.spark.createDataFrame([], schema=USER_CATEGORIES)

    def invalidate(self):
        with self._lock:
            if self._overlay is not None:
                self._overlay.unpersist()
            self._overlay = None

    # -- handlers ----------------------------------------------------

    def list_transactions(self, q: dict) -> dict:
        from .transactions import get_transactions_filtered

        page = get_transactions_filtered(
            self.overlay(),
            limit=int(q.get("limit", ["100"])[0]),
            offset=int(q.get("offset", ["0"])[0]),
            view_mode=q.get("view_mode", [None])[0],
            description_search=q.get("search", [None])[0],
            exclude_low_confidence=q.get("exclude_low_confidence", ["false"])[0].lower()
            == "true",
            sort_by=q.get("sort_by", [None])[0],
            sort_order=q.get("sort_order", ["desc"])[0],
        )
        return {
            "total_count": page.total_count,
            "transactions": _rows(page.transactions),
        }

    def get_transaction(self, txn_id: str) -> dict:
        from .transactions import get_transaction_by_id

        rows = _rows(get_transaction_by_id(self.overlay(), txn_id))
        if not rows:
            raise HttpError(404, f"transaction {txn_id} not found")
        return rows[0]

    def predicted_categories(self) -> list:
        from .transactions import distinct_predicted_categories

        return [r["predicted_master_category"]
                for r in _rows(distinct_predicted_categories(self.overlay()))]

    def categorize(self, txn_id: str, body: dict) -> dict:
        from .transactions import categorize_transaction

        if not body.get("master_category"):
            raise HttpError(400, "master_category is required")
        categorize_transaction(
            self.spark,
            self.wh.path("public", "user_categories"),
            txn_id,
            master_category=body["master_category"],
            source_category=body.get("source_category"),
            notes=body.get("notes"),
            validated=body.get("validated", True),
            exclude_from_forecast=body.get("exclude_from_forecast"),
            updated_by=body.get("updated_by", "api"),
        )
        self.invalidate()
        return {"status": "success", "transaction_id": txn_id}

    def _override_field(self, txn_id: str, body: dict, field: str, required_key: str) -> dict:
        from .transactions import categorize_transaction

        if required_key not in body:
            raise HttpError(400, f"{required_key} is required")
        existing = self.get_transaction(txn_id)  # 404s if unknown
        # user_categories.master_category is NOT NULL; an uncategorized
        # transaction being validated falls back to its prediction (or
        # the reserved UNCERTAIN), same precedence as the overlay read.
        category = (
            existing["master_category"]
            or existing["predicted_master_category"]
            or "UNCERTAIN"
        )
        categorize_transaction(
            self.spark,
            self.wh.path("public", "user_categories"),
            txn_id,
            master_category=category,
            **{field: body[required_key]},
            updated_by=body.get("updated_by", "api"),
        )
        self.invalidate()
        return {"status": "success", "transaction_id": txn_id}

    def bulk_validate(self, body: dict) -> dict:
        from .transactions import bulk_categorize

        assignments = body.get("assignments")
        if not isinstance(assignments, list) or not assignments:
            raise HttpError(400, "assignments must be a non-empty list")
        for a in assignments:
            if "transaction_id" not in a or "master_category" not in a:
                raise HttpError(400, "each assignment needs transaction_id and master_category")
            a.setdefault("validated", True)
        n = bulk_categorize(
            self.spark, self.wh.path("public", "user_categories"), assignments,
            updated_by=body.get("updated_by", "api"),
        )
        self.invalidate()
        return {"status": "success", "updated": n}

    def list_validated(self, q: dict) -> dict:
        from .validated import list_validated_transactions

        page = list_validated_transactions(
            self.wh.read("analytics", "fct_validated_trxns"),
            self._user_categories(),
            limit=int(q.get("limit", ["100"])[0]),
            offset=int(q.get("offset", ["0"])[0]),
            sort_by=q.get("sort_by", [None])[0],
            sort_order=q.get("sort_order", ["desc"])[0],
            category=q.get("category", [None])[0],
            account_name_filter=q.get("account_name", [None])[0],
            description_search=q.get("search", [None])[0],
        )
        return {
            "total_count": page.total_count,
            "transactions": _rows(page.transactions),
        }

    def validated_categories(self) -> list:
        from .validated import distinct_validated_categories

        return [r["master_category"] for r in _rows(
            distinct_validated_categories(self.wh.read("analytics", "fct_validated_trxns"))
        )]

    def categories(self) -> list:
        import os

        from .categories import ensure_default_categories, get_active_category_names

        path = self.wh.path("public", "categories")
        catalog = (
            self.spark.read.parquet(path) if os.path.exists(path) else None
        )
        return get_active_category_names(ensure_default_categories(self.spark, catalog))

    def connection_health(self) -> list:
        from .control_center import connection_health

        return _rows(connection_health(self.wh.read("public", "simplefin")))

    def metrics_history(self) -> dict:
        import os

        from ..ml.registry import registry_metrics_view

        path = self.wh.path("analytics", "model_registry")
        if not os.path.exists(path):
            return {"history": []}
        view = registry_metrics_view(self.spark.read.parquet(path))
        return {"history": _rows(view.orderBy("training_timestamp"))}

    def training_status(self) -> dict:
        import os

        path = self.wh.path("analytics", "model_registry")
        if not os.path.exists(path):
            return {"status": "never_trained", "model_version": None}
        latest = _rows(
            self.spark.read.parquet(path)
            .filter("is_latest")
            .select("model_version", "status", "training_timestamp")
            .limit(1)
        )
        if not latest:
            return {"status": "never_trained", "model_version": None}
        return latest[0]

    # -- routing -----------------------------------------------------

    _TXN_SUB = re.compile(r"^/api/transactions/([^/]+)(?:/([a-z\-]+))?$")

    def route(self, method: str, path: str, query: dict, body: dict):
        if path == "/api/transactions" and method == "GET":
            return self.list_transactions(query)
        if path == "/api/transactions/categories/list" and method == "GET":
            return self.predicted_categories()
        if path == "/api/transactions/bulk-validate" and method == "POST":
            return self.bulk_validate(body)
        if path == "/api/validated" and method == "GET":
            return self.list_validated(query)
        if path == "/api/validated/categories/list" and method == "GET":
            return self.validated_categories()
        if path == "/api/categories" and method == "GET":
            return self.categories()
        if path == "/api/control-center/connection-health" and method == "GET":
            return self.connection_health()
        if path == "/api/model-metrics/metrics/history" and method == "GET":
            return self.metrics_history()
        if path == "/api/model-metrics/training-status" and method == "GET":
            return self.training_status()
        m = self._TXN_SUB.match(path)
        if m:
            txn_id, action = m.group(1), m.group(2)
            if action is None and method == "GET":
                return self.get_transaction(txn_id)
            if action == "categorize" and method == "POST":
                return self.categorize(txn_id, body)
            if action == "validate" and method == "PUT":
                return self._override_field(txn_id, body, "validated", "validated")
            if action == "notes" and method == "PUT":
                return self._override_field(txn_id, body, "notes", "notes")
            if action == "exclude-from-forecast" and method == "PUT":
                return self._override_field(
                    txn_id, body, "exclude_from_forecast", "exclude_from_forecast"
                )
        raise HttpError(404, f"no route for {method} {path}")


def make_server(app: ServingApp, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) a threaded HTTP server over the app. Callers
    run ``server.serve_forever()`` (typically in a daemon thread) and
    read the bound port from ``server.server_address[1]``."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _dispatch(self, method: str):
            parsed = urlparse(self.path)
            body = {}
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                try:
                    body = json.loads(self.rfile.read(length))
                except json.JSONDecodeError:
                    self._send(400, {"error": "invalid JSON body"})
                    return
            try:
                result = app.route(method, parsed.path, parse_qs(parsed.query), body)
                self._send(200, result)
            except HttpError as e:
                self._send(e.status, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface, don't crash the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def _send(self, status: int, payload):
            data = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PUT(self):
            self._dispatch("PUT")

    return ThreadingHTTPServer((host, port), Handler)
