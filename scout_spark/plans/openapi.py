"""OpenAPI document + FastAPI-grade request validation for the HTTP
shim (closes the reference's schema-docs surface: FastAPI generates
/openapi.json from the pydantic models in app.py:14-38 and the
``openapi_examples`` block in app.py:74-85; the stdlib fallback server
previously had neither).

Two exports:

- :func:`openapi_spec` — the OpenAPI 3.1 document with the same
  component schemas (ForwardCandidate/ForwardReq/Hit/ForwardResp), the
  same route metadata (summary, tags, examples) and FastAPI's standard
  HTTPValidationError envelope.
- :func:`validate_forward` — schema validation producing pydantic-v2
  style error objects ``{"type", "loc", "msg", "input"}``; the handler
  returns them under ``{"detail": [...]}`` with status 422, exactly the
  FastAPI wire shape, so a client written against the reference sees
  identical error semantics.
"""

from __future__ import annotations

from typing import Any

from scout_spark.plans.api import ForwardRequest

# --------------------------------------------------------------- schemas

_COMPONENTS: dict[str, Any] = {
    "ForwardCandidate": {
        "title": "ForwardCandidate",
        "type": "object",
        "properties": {"text": {"title": "Text", "type": "string"}},
        "required": ["text"],
    },
    "ForwardReq": {
        "title": "ForwardReq",
        "type": "object",
        "properties": {
            "candidates": {
                "title": "Candidates",
                "type": "array",
                # convenience beyond the reference model: bare strings
                # are accepted and treated as {"text": s}
                "items": {
                    "anyOf": [
                        {"$ref": "#/components/schemas/ForwardCandidate"},
                        {"type": "string"},
                    ]
                },
                "minItems": 1,
            },
            "country": {
                "title": "Country",
                "anyOf": [{"type": "string"}, {"type": "null"}],
            },
            "city_hint": {
                "title": "City Hint",
                "anyOf": [{"type": "string"}, {"type": "null"}],
            },
            "limit": {
                "title": "Limit",
                "type": "integer",
                "default": 5,
                "minimum": 1,
                "maximum": 50,
            },
        },
        "required": ["candidates"],
    },
    "Hit": {
        "title": "Hit",
        "type": "object",
        "properties": {
            "name": {"title": "Name", "type": "string"},
            "lat": {"title": "Lat", "type": "number"},
            "lon": {"title": "Lon", "type": "number"},
            "country": {"anyOf": [{"type": "string"}, {"type": "null"}]},
            "state": {"anyOf": [{"type": "string"}, {"type": "null"}]},
            "city": {"anyOf": [{"type": "string"}, {"type": "null"}]},
            "osm_id": {"title": "Osm Id", "type": "integer"},
            "kind": {"anyOf": [{"type": "string"}, {"type": "null"}]},
            "score": {"title": "Score", "type": "number"},
        },
        "required": ["name", "lat", "lon", "osm_id", "score"],
    },
    "ForwardResp": {
        "title": "ForwardResp",
        "type": "object",
        "properties": {
            "hits": {
                "title": "Hits",
                "type": "array",
                "items": {"$ref": "#/components/schemas/Hit"},
            }
        },
        "required": ["hits"],
    },
    "ValidationError": {
        "title": "ValidationError",
        "type": "object",
        "properties": {
            "loc": {
                "title": "Location",
                "type": "array",
                "items": {"anyOf": [{"type": "string"}, {"type": "integer"}]},
            },
            "msg": {"title": "Message", "type": "string"},
            "type": {"title": "Error Type", "type": "string"},
        },
        "required": ["loc", "msg", "type"],
    },
    "HTTPValidationError": {
        "title": "HTTPValidationError",
        "type": "object",
        "properties": {
            "detail": {
                "title": "Detail",
                "type": "array",
                "items": {"$ref": "#/components/schemas/ValidationError"},
            }
        },
    },
}


def openapi_spec() -> dict:
    """The service's OpenAPI 3.1 document (served at GET /openapi.json,
    where FastAPI serves its generated one)."""
    return {
        "openapi": "3.1.0",
        "info": {"title": "scout", "version": "1.0.0"},
        "paths": {
            "/v1/geocode/forward": {
                "post": {
                    "summary": "Name → lat/lon",
                    "tags": ["geocoding"],
                    "operationId": "forward_v1_geocode_forward_post",
                    "requestBody": {
                        "required": True,
                        "content": {
                            "application/json": {
                                "schema": {
                                    "$ref": "#/components/schemas/ForwardReq"
                                },
                                # reference app.py:76-84 openapi_examples
                                "examples": {
                                    "basic": {
                                        "summary": "Restaurant by country",
                                        "value": {
                                            "candidates": [
                                                {"text": "Monograph Dining"}
                                            ],
                                            "country": "my",
                                            "limit": 3,
                                        },
                                    }
                                },
                            }
                        },
                    },
                    "responses": {
                        "200": {
                            "description": "Successful Response",
                            "content": {
                                "application/json": {
                                    "schema": {
                                        "$ref": "#/components/schemas/ForwardResp"
                                    }
                                }
                            },
                        },
                        "422": {
                            "description": "Validation Error",
                            "content": {
                                "application/json": {
                                    "schema": {
                                        "$ref": (
                                            "#/components/schemas/"
                                            "HTTPValidationError"
                                        )
                                    }
                                }
                            },
                        },
                    },
                }
            },
            "/healthz": {
                "get": {
                    "summary": "Liveness probe",
                    "operationId": "healthz_healthz_get",
                    "responses": {
                        "200": {
                            "description": "Successful Response",
                            "content": {
                                "application/json": {
                                    "schema": {
                                        "title": "Health",
                                        "type": "object",
                                        "properties": {
                                            "ok": {"type": "boolean"}
                                        },
                                    }
                                }
                            },
                        }
                    },
                }
            },
        },
        "components": {"schemas": dict(_COMPONENTS)},
    }


# ------------------------------------------------------------ validation


def _err(type_: str, loc: tuple, msg: str, input_: Any) -> dict:
    return {"type": type_, "loc": list(loc), "msg": msg, "input": input_}


def validate_forward(
    body: Any,
) -> tuple[ForwardRequest | None, list[dict]]:
    """Validate a decoded JSON body against ForwardReq.

    Returns ``(request, [])`` on success or ``(None, errors)`` where
    each error is a pydantic-v2-style object; the caller wraps them as
    ``{"detail": errors}`` with status 422 (FastAPI semantics).
    """
    errors: list[dict] = []
    if not isinstance(body, dict):
        return None, [
            _err("model_attributes_type", ("body",),
                 "Input should be a valid dictionary", body)
        ]

    raw = body.get("candidates")
    texts: list[str] = []
    if raw is None:
        errors.append(
            _err("missing", ("body", "candidates"), "Field required", None)
        )
    elif not isinstance(raw, list):
        errors.append(
            _err("list_type", ("body", "candidates"),
                 "Input should be a valid list", raw)
        )
    else:
        for i, c in enumerate(raw):
            if isinstance(c, str):
                texts.append(c)
            elif isinstance(c, dict):
                text = c.get("text")
                if not isinstance(text, str):
                    errors.append(
                        _err(
                            "string_type" if "text" in c else "missing",
                            ("body", "candidates", i, "text"),
                            "Input should be a valid string"
                            if "text" in c else "Field required",
                            c.get("text"),
                        )
                    )
                else:
                    texts.append(text)
            else:
                errors.append(
                    _err("model_type", ("body", "candidates", i),
                         "Input should be a valid dictionary or string", c)
                )
        if isinstance(raw, list) and not raw:
            errors.append(
                _err("too_short", ("body", "candidates"),
                     "List should have at least 1 item after validation", raw)
            )

    def _opt_str(name: str):
        v = body.get(name)
        if v is not None and not isinstance(v, str):
            errors.append(
                _err("string_type", ("body", name),
                     "Input should be a valid string", v)
            )
            return None
        return v

    country = _opt_str("country")
    city_hint = _opt_str("city_hint")

    limit_raw = body.get("limit", 5)
    limit = 5
    limit_ok = False
    # pydantic v2 lax mode: bool is NOT a valid int; int-like strings
    # coerce; floats with no fractional part coerce
    if isinstance(limit_raw, bool) or not isinstance(
        limit_raw, (int, float, str)
    ):
        errors.append(
            _err("int_type", ("body", "limit"),
                 "Input should be a valid integer", limit_raw)
        )
    elif isinstance(limit_raw, float):
        if limit_raw.is_integer():
            limit, limit_ok = int(limit_raw), True
        else:
            errors.append(
                _err("int_from_float", ("body", "limit"),
                     "Input should be a valid integer, got a number with "
                     "a fractional part", limit_raw)
            )
    elif isinstance(limit_raw, str):
        try:
            limit, limit_ok = int(limit_raw), True
        except ValueError:
            errors.append(
                _err("int_parsing", ("body", "limit"),
                     "Input should be a valid integer, unable to parse "
                     "string as an integer", limit_raw)
            )
    else:
        limit, limit_ok = limit_raw, True
    # the range constraint is reported alongside any other field's
    # errors (pydantic validates fields independently and returns the
    # full error list in one 422)
    if limit_ok and not 1 <= limit <= 50:
        errors.append(
            _err(
                "greater_than_equal" if limit < 1 else "less_than_equal",
                ("body", "limit"),
                "Input should be greater than or equal to 1"
                if limit < 1 else "Input should be less than or equal to 50",
                limit,
            )
        )

    if errors:
        return None, errors
    return (
        ForwardRequest(
            candidates=texts, country=country, city_hint=city_hint, limit=limit
        ),
        [],
    )
