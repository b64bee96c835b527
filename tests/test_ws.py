"""Web service parity tests — reference: packages/ws (openapi.yaml,
routes/{csvw2rdf,rdf2csvw,validate}.ts). A real localhost HTTP server in a
thread; requests via stdlib http.client; conversions share the CLI code
paths, so these tests exercise transport + option plumbing."""

from __future__ import annotations

import http.client
import io
import json
import threading
import zipfile

import pytest

from csvw_rdf_convertor_spark.ws import make_server

FOAF_NAME = "http://xmlns.com/foaf/0.1/name"
EX_ID = "http://ex.org/def#id"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

DESCRIPTOR = {
    "@context": "http://www.w3.org/ns/csvw",
    "url": "people.csv",
    "tableSchema": {
        "aboutUrl": "http://ex.org/p/{id}",
        "columns": [
            {"name": "id", "titles": "id", "datatype": "integer",
             "required": True, "propertyUrl": EX_ID},
            {"name": "name", "titles": "name", "propertyUrl": FOAF_NAME},
        ],
    },
}
CSV = "id,name\n1,Alice\n2,Bob\n"

EXPECTED = {
    ("http://ex.org/p/1", EX_ID, "1", "literal", XSD_INT, "", ""),
    ("http://ex.org/p/1", FOAF_NAME, "Alice", "literal", "", "", ""),
    ("http://ex.org/p/2", EX_ID, "2", "literal", XSD_INT, "", ""),
    ("http://ex.org/p/2", FOAF_NAME, "Bob", "literal", "", "", ""),
}


@pytest.fixture(scope="module")
def server(spark):  # spark first: the handlers reuse the active session
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _post(addr, path, body: bytes, content_type: str):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": content_type})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _post_json(addr, path, options, files=None):
    return _post(addr, path,
                 json.dumps({"options": options,
                             "files": files or {}}).encode("utf-8"),
                 "application/json")


def _parse(spark, text: str, ext: str):
    import os
    import tempfile
    from csvw_rdf_convertor_spark.sources.parse import read_rdf
    p = os.path.join(tempfile.mkdtemp(prefix="ws_rt_"), "doc." + ext)
    with open(p, "w", encoding="utf-8") as f:
        f.write(text)
    return {tuple(r) for r in read_rdf(spark, p).collect()}


def test_csvw2rdf_ntriples(spark, server):
    status, mime, data = _post_json(
        server, "/csvw2rdf",
        {"input": "meta.json", "format": "ntriples", "minimal": True},
        {"meta.json": json.dumps(DESCRIPTOR), "people.csv": CSV})
    assert status == 200
    assert mime == "application/n-triples"   # mimeTypes parity
    assert _parse(spark, data.decode(), "nt") == EXPECTED


def test_csvw2rdf_turtle_default_format(spark, server):
    status, mime, data = _post_json(
        server, "/csvw2rdf",
        {"input": "meta.json", "minimal": True,
         "turtle": {"prefixes": {"foaf": "http://xmlns.com/foaf/0.1/"}}},
        {"meta.json": json.dumps(DESCRIPTOR), "people.csv": CSV})
    assert status == 200
    assert mime == "application/turtle"
    assert b"foaf" in data
    assert _parse(spark, data.decode(), "ttl") == EXPECTED


def test_csvw2rdf_multipart(spark, server):
    boundary = "XwsBoundaryX"
    parts = [
        ("options", None,
         json.dumps({"input": "meta.json", "format": "ntriples",
                     "minimal": True})),
        ("meta.json", "meta.json", json.dumps(DESCRIPTOR)),
        ("people.csv", "people.csv", CSV),
    ]
    buf = io.StringIO()
    for name, filename, content in parts:
        buf.write(f"--{boundary}\r\n")
        disp = f'form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        buf.write(f"Content-Disposition: {disp}\r\n\r\n{content}\r\n")
    buf.write(f"--{boundary}--\r\n")
    status, mime, data = _post(
        server, "/csvw2rdf", buf.getvalue().encode("utf-8"),
        f"multipart/form-data; boundary={boundary}")
    assert status == 200
    assert _parse(spark, data.decode(), "nt") == EXPECTED


def test_rdf2csvw_zip(server):
    nt = "\n".join(
        f'<{s}> <{p}> "{o}"' + (f"^^<{d}>" if d else "") + " ."
        for s, p, o, _k, d, _l, _g in sorted(EXPECTED))
    status, mime, data = _post_json(
        server, "/rdf2csvw",
        {"input": "input.nt", "descriptor": "meta.json"},
        {"input.nt": nt + "\n", "meta.json": json.dumps(DESCRIPTOR)})
    assert status == 200
    assert mime == "application/zip"
    z = zipfile.ZipFile(io.BytesIO(data))
    assert set(z.namelist()) == {"people.csv", "descriptor.json"}
    rows = z.read("people.csv").decode().strip().splitlines()
    assert rows[0].split(",") == ["id", "name"]
    assert sorted(rows[1:]) == ["1,Alice", "2,Bob"]


def test_validate_ndjson(server):
    bad_csv = "id,name\n,Alice\n"
    status, mime, data = _post_json(
        server, "/validate", {"input": "meta.json"},
        {"meta.json": json.dumps(DESCRIPTOR), "people.csv": bad_csv})
    assert status == 200
    assert mime == "application/x-ndjson"
    issues = [json.loads(line) for line in data.decode().splitlines()
              if line.strip()]
    assert any(i["type"] == "error" and "required" in i["message"]
               for i in issues)


def test_validate_clean_is_empty_stream(server):
    status, mime, data = _post_json(
        server, "/validate", {"input": "meta.json"},
        {"meta.json": json.dumps(DESCRIPTOR), "people.csv": CSV})
    assert status == 200
    assert data.decode().strip() == ""


def test_remote_input_is_a_seam(server):
    status, _mime, data = _post_json(
        server, "/csvw2rdf", {"input": "https://example.com/meta.json"})
    assert status == 422
    assert b"network" in data


def test_unknown_route_404(server):
    status, _mime, _data = _post_json(server, "/nope", {"input": "x"})
    assert status == 404


def test_bad_body_400(server):
    status, _m, _d = _post(server, "/csvw2rdf", b"[]", "application/json")
    assert status == 400


def test_rdf2csvw_server_local_descriptor(server, tmp_path):
    """options.descriptor naming a server-local file must drive the
    conversion (it was silently ignored unless uploaded — inference ran
    instead, a wrong-but-200 response)."""
    nt = "\n".join(
        f'<{s}> <{p}> "{o}"' + (f"^^<{d}>" if d else "") + " ."
        for s, p, o, _k, d, _l, _g in sorted(EXPECTED))
    desc_path = tmp_path / "meta.json"
    desc_path.write_text(json.dumps(DESCRIPTOR), encoding="utf-8")
    status, mime, data = _post_json(
        server, "/rdf2csvw",
        {"input": "input.nt", "descriptor": str(desc_path)},
        {"input.nt": nt + "\n"})
    assert status == 200
    z = zipfile.ZipFile(io.BytesIO(data))
    # descriptor-driven output: the table is people.csv with the
    # descriptor's column titles (inference would name it from the graph)
    assert "people.csv" in z.namelist()
    rows = z.read("people.csv").decode().strip().splitlines()
    assert rows[0].split(",") == ["id", "name"]


def test_rdf2csvw_missing_descriptor_422(server):
    status, _mime, _data = _post_json(
        server, "/rdf2csvw",
        {"input": "input.nt", "descriptor": "/nonexistent/meta.json"},
        {"input.nt": '<http://s> <http://p> "v" .\n'})
    assert status == 422


def test_request_workdirs_are_cleaned_up(server):
    import glob
    import os
    import tempfile
    pat = os.path.join(tempfile.gettempdir(), "csvw_ws_*")
    before = set(glob.glob(pat))
    status, _m, _d = _post_json(
        server, "/validate", {"input": "meta.json"},
        {"meta.json": json.dumps(DESCRIPTOR), "people.csv": CSV})
    assert status == 200
    assert set(glob.glob(pat)) <= before  # per-request tempdir removed
