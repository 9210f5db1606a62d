"""Serving facade — the reference's query entry points, engine-native.

The reference serves scoring through Flask routes (``POST /api`` JSON,
``POST /index`` form + cursor; reference ``assets/app_nfl.py`` §3 of
SURVEY.md). The engine keeps the HTTP layer out of core and exposes the
same contracts as plain functions over a SparkSession + two models:

- ``score(record)``        — 10-field dict in, best-play dict out
- ``score_json(payload)``  — JSON string in/out (the /api wire contract)
- ``score_batch(df)``      — N rows in one vectorized pass
- ``next_play(cursor)``    — positional row lookup over an ordered plays
                             table (the /index "next play" cursor)

Models load once at service construction (the reference loads at boot,
``assets/app_nfl.py:337-338``; its Livy path reloads per statement —
the engine never does).
"""

from __future__ import annotations

import json

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.ml.score import score_best_play, score_record
from nfl_predictions_spark.schemas import SCORE_REQUEST_SCHEMA


class ScoringService:
    def __init__(
        self,
        spark: SparkSession,
        pass_model: PipelineModel,
        run_model: PipelineModel,
        plays: DataFrame | None = None,
    ):
        self.spark = spark
        self.pass_model = pass_model
        self.run_model = run_model
        self._plays = plays

    @classmethod
    def from_trained(cls, spark: SparkSession, plays: DataFrame | None = None):
        from nfl_predictions_spark.ml.queries import trained_models

        return cls(spark, *trained_models(spark), plays=plays)

    # -- /api contract ------------------------------------------------------
    def score(self, record: dict) -> dict:
        return score_record(self.spark, self.pass_model, self.run_model, record)

    def score_json(self, payload: str) -> str:
        """JSON-in/JSON-out single-record scoring. Missing fields raise
        (the reference silently NameError'd on its sklearn route — a
        documented defect we do not reproduce; SURVEY §2A notes)."""
        record = json.loads(payload)
        missing = [f.name for f in SCORE_REQUEST_SCHEMA.fields if f.name not in record]
        if missing:
            raise ValueError(f"missing required fields: {missing}")
        return json.dumps(self.score(record))

    # -- batch scoring ------------------------------------------------------
    def score_batch(self, requests: DataFrame) -> DataFrame:
        return score_best_play(self.pass_model, self.run_model, requests)

    # -- HTTP binding (reference-parity smoke surface) ----------------------
    def serve_http(self, host: str = "127.0.0.1", port: int = 0):
        """Bind the ``/api`` contract to a localhost HTTP listener —
        the end-to-end shape of the reference's serving app (single-
        threaded Flask on :4444, ``assets/app_nfl.py:282-343``), with
        stdlib ``http.server`` so the engine core stays framework-free.
        Returns the bound ``HTTPServer``; the caller owns
        ``serve_forever``/``shutdown``. Malformed or incomplete requests
        get a 400 (the reference's bare ``except`` swallowed them — a
        documented defect we do not reproduce)."""
        from http.server import BaseHTTPRequestHandler, HTTPServer

        service = self

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != "/api":
                    self.send_error(404, "unknown route")
                    return
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n).decode("utf-8")
                try:
                    out = service.score_json(body).encode("utf-8")
                    code = 200
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    out = json.dumps({"error": str(e)}).encode("utf-8")
                    code = 400
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *args):  # keep test output clean
                pass

        return HTTPServer((host, port), _Handler)

    # -- /index cursor ------------------------------------------------------
    def next_play(self, cursor: int) -> dict | None:
        """Nth play of the ordered plays table (reference get_next_play,
        ``assets/app_nfl.py:68-71``) — ORDER BY + OFFSET/LIMIT, not a
        driver-side row list."""
        if self._plays is None:
            raise ValueError("no plays table attached")
        rows = (
            self._plays.orderBy(F.desc("Date"), F.asc("GameID"), F.desc("TimeSecs"))
            .offset(cursor)
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None
