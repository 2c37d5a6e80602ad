"""URI helpers — parity with /root/reference/src/SmartReader/UriExtensions.cs."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}


class PageUri:
    """Pre-split page URI with the reference's base/pathBase notions."""

    __slots__ = ("raw", "scheme", "host", "port", "userinfo", "path", "prepath", "pathbase")

    def __init__(self, uri: str) -> None:
        self.raw = uri
        parts = urlsplit(uri)
        self.scheme = parts.scheme or "https"
        self.host = parts.hostname or ""
        self.port = parts.port
        self.userinfo = ""
        if parts.username:
            self.userinfo = parts.username
            if parts.password:
                self.userinfo += ":" + parts.password
        path = parts.path or "/"
        self.path = path
        # UriExtensions.cs:9-29 GetBase
        base = self.scheme + "://"
        if self.userinfo:
            base += self.userinfo + "@"
        base += self.host
        if self.port is not None and self.port != _DEFAULT_PORTS.get(self.scheme):
            base += f":{self.port}"
        self.prepath = base
        # UriExtensions.cs:31-34 GetPathBase
        self.pathbase = base + path[: path.rfind("/") + 1]

    @property
    def path_and_query(self) -> str:
        parts = urlsplit(self.raw)
        pq = parts.path or "/"
        if parts.query:
            pq += "?" + parts.query
        return pq


def is_well_formed_absolute(uri: str) -> bool:
    """Approximation of C# Uri.IsWellFormedUriString(uri, UriKind.Absolute):
    has a scheme and contains no raw whitespace or raw non-URI chars that
    .NET rejects."""
    if not _SCHEME_RE.match(uri):
        return False
    if any(c in uri for c in (" ", "\t", "\n", "\r")):
        return False
    return True


def to_absolute_uri(page: PageUri, uri_to_check: str) -> str:
    """UriExtensions.cs:36-74 — rule-for-rule."""
    if len(uri_to_check) == 0:
        return page.pathbase
    if is_well_formed_absolute(uri_to_check):
        return uri_to_check
    if uri_to_check[0] == "#":
        return uri_to_check
    if uri_to_check.startswith("//"):
        return page.scheme + "://" + uri_to_check[2:]
    if uri_to_check[0] == "/":
        return page.prepath + uri_to_check
    if uri_to_check.startswith("./"):
        return page.pathbase + uri_to_check[2:]
    if uri_to_check.startswith("data:"):
        return uri_to_check
    return page.pathbase + uri_to_check
