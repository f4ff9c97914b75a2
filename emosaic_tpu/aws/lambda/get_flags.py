"""Lambda: bulk flag lookup (reference surface: aws-backend/lambda/get_flags.py).

Route: POST /tiles/flags with body {"tileHashes": [...]}; at most 100
hashes per request (get_flags.py:27-28). Returns {"flags": {hash: bool}}.
"""

from __future__ import annotations

import json
import os

MAX_HASHES = 100
_TABLE = None


def _table():
    global _TABLE
    if _TABLE is None:
        import boto3

        env = os.environ.get("ENVIRONMENT", "prod")
        _TABLE = boto3.resource("dynamodb").Table(f"{env}-tile-flags")
    return _TABLE


def _response(status: int, body: dict) -> dict:
    return {
        "statusCode": status,
        "headers": {
            "Content-Type": "application/json",
            "Access-Control-Allow-Origin": os.environ.get("CORS_ORIGIN", "*"),
            "Access-Control-Allow-Methods": "POST,OPTIONS",
            "Access-Control-Allow-Headers": "Content-Type",
        },
        "body": json.dumps(body),
    }


def handler(event, context):
    method = (
        event.get("httpMethod")
        or event.get("requestContext", {}).get("http", {}).get("method", "")
    ).upper()
    if method == "OPTIONS":
        return _response(200, {})

    try:
        body = json.loads(event.get("body") or "{}")
    except json.JSONDecodeError:
        return _response(400, {"error": "invalid JSON body"})

    hashes = body.get("tileHashes")
    if not isinstance(hashes, list) or not hashes:
        return _response(400, {"error": "tileHashes must be a non-empty list"})
    if len(hashes) > MAX_HASHES:
        return _response(400, {"error": f"at most {MAX_HASHES} hashes per request"})
    hashes = [str(h) for h in hashes if str(h).isalnum() and len(str(h)) <= 64]

    table = _table()
    flags: dict[str, bool] = {}
    # BatchGetItem in chunks of 100 keys (DynamoDB limit)
    import boto3  # noqa: F401

    client = table.meta.client
    for i in range(0, len(hashes), 100):
        chunk = hashes[i : i + 100]
        resp = client.batch_get_item(
            RequestItems={
                table.name: {"Keys": [{"tileHash": h} for h in chunk]}
            }
        )
        found = {
            item["tileHash"] for item in resp.get("Responses", {}).get(table.name, [])
        }
        for h in chunk:
            flags[h] = h in found
    return _response(200, {"flags": flags, "count": sum(flags.values())})
