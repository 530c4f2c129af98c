"""Pure-stdlib WARC 1.0 container codec (ISO 28500 / the format
CommonCrawl ships): an encoder + record walker pair, used by the web
operators so the crawl ladder's entry path — split a WARC container
into records, hand each response payload to the HTML extraction stage
(web04) — is real end-to-end.

Scope (honest gates, the jpeg/png/wav codec pattern):
- WARC/1.0 and WARC/1.1 version lines are accepted; anything else
  raises (a corrupt or non-WARC file must fail loudly, not parse as
  garbage records)
- framing is Content-Length based per the spec (§4: named headers,
  CRLF CRLF terminator, two CRLFs after the block); a record whose
  declared block + trailer run past the buffer raises ``truncated``
- gzip members are handled transparently (CommonCrawl ships one gzip
  member per record, concatenated — stdlib ``gzip.decompress`` walks
  concatenated members); offsets then refer to the DECOMPRESSED
  stream, which is the layout the framing describes
- header names are case-insensitive per spec; values are taken to the
  first CRLF (no continuation-line folding — CommonCrawl does not
  emit folded headers; a folded header raises rather than mis-frames)

The reference models no ingestion at all (its scope is post-exec plan
analysis; `hivehook/.../hook/PostExecHook.scala:15`) — this is
LLM-pipeline scope: the CommonCrawl entry stage of the web01-web10
crawl ladder.
"""

from __future__ import annotations

from collections.abc import Iterator

CRLF = "\r\n"
_B_CRLF2 = b"\r\n\r\n"


def encode_warc_record(
    warc_type: str,
    headers: list[tuple[str, str]],
    block: bytes,
) -> bytes:
    """One WARC record: version line, WARC-Type, caller headers,
    Content-Length framing, block, and the spec's two-CRLF trailer."""
    head = [
        f"WARC/1.0{CRLF}",
        f"WARC-Type: {warc_type}{CRLF}",
        *(f"{k}: {v}{CRLF}" for k, v in headers),
        f"Content-Length: {len(block)}{CRLF}",
        CRLF,
    ]
    return "".join(head).encode("utf-8") + block + _B_CRLF2


def encode_warcinfo(software: str = "hive-lineage-spark/0.1") -> bytes:
    """The file-level warcinfo record every WARC container leads with."""
    body = (
        f"software: {software}{CRLF}"
        f"format: WARC File Format 1.0{CRLF}"
    ).encode("utf-8")
    return encode_warc_record(
        "warcinfo",
        [("Content-Type", "application/warc-fields")],
        body,
    )


def encode_response_record(uri: str, record_id: str, http_body: bytes) -> bytes:
    """A response record carrying an HTTP/1.1 200 payload — the record
    type CommonCrawl's fetch output consists of."""
    block = (
        f"HTTP/1.1 200 OK{CRLF}"
        f"Content-Type: text/html{CRLF}"
        f"{CRLF}"
    ).encode("utf-8") + http_body
    return encode_warc_record(
        "response",
        [
            ("WARC-Target-URI", uri),
            ("WARC-Record-ID", record_id),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        block,
    )


def _parse_headers(raw: bytes) -> dict[str, str]:
    lines = raw.split(b"\r\n")
    version = lines[0].decode("utf-8", "replace")
    if version not in ("WARC/1.0", "WARC/1.1"):
        raise ValueError(f"not a WARC record header: {version!r}")
    out: dict[str, str] = {}
    for line in lines[1:]:
        if line[:1] in (b" ", b"\t"):
            raise ValueError("folded WARC header (continuation line) unsupported")
        k, sep, v = line.partition(b": ")
        if not sep:
            raise ValueError(f"malformed WARC header line: {line!r}")
        out[k.decode("utf-8").lower()] = v.decode("utf-8")
    return out


def walk_warc(data: bytes) -> Iterator[dict]:
    """Split a (decompressed) WARC byte stream into records.

    Yields one dict per record: ``offset`` / ``length`` (byte framing
    in the stream), ``type``, the lowercased ``headers`` map, and the
    raw ``block`` bytes. Pure linear pass — the caller dispatches on
    ``type`` (CommonCrawl interleaves warcinfo/request/response/
    metadata records; a pipeline consumes the responses)."""
    off, n = 0, len(data)
    while off < n:
        hdr_end = data.find(_B_CRLF2, off)
        if hdr_end < 0:
            raise ValueError(f"truncated WARC record header at offset {off}")
        headers = _parse_headers(data[off:hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/invalid Content-Length at offset {off}") from None
        block_start = hdr_end + 4
        rec_end = block_start + clen + 4  # block + the two-CRLF trailer
        if rec_end > n:
            raise ValueError(
                f"truncated WARC record at offset {off}: "
                f"needs {rec_end - off} bytes, {n - off} available"
            )
        if data[rec_end - 4 : rec_end] != _B_CRLF2:
            raise ValueError(f"missing record trailer at offset {off}")
        yield {
            "offset": off,
            "length": rec_end - off,
            "type": headers.get("warc-type", ""),
            "headers": headers,
            "block": data[block_start : block_start + clen],
        }
        off = rec_end


def split_http_response(block: bytes) -> tuple[int, bytes]:
    """(status code, body bytes) out of an application/http response
    block — the minimal HTTP parse the response payload needs before
    the HTML extraction stage takes over."""
    sep = block.find(_B_CRLF2)
    if sep < 0:
        raise ValueError("HTTP response block has no header/body separator")
    status_line = block[: block.find(b"\r\n")].decode("utf-8", "replace")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"malformed HTTP status line: {status_line!r}")
    if not parts[1].isdigit():
        raise ValueError(f"non-numeric HTTP status code in line: {status_line!r}")
    return int(parts[1]), block[sep + 4 :]


def maybe_gunzip(name: str, data: bytes) -> bytes:
    """Decompress ``.gz`` members (CommonCrawl's per-record-member
    layout decompresses as one concatenated stream); plain bytes pass
    through."""
    if name.endswith(".gz"):
        import gzip

        return gzip.decompress(data)
    return data
