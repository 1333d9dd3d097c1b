"""S3 path handler (reference: marie/storage/s3_storage.py:98).

The reference uses boto3; boto3 is not present in this environment, so
this handler speaks the S3 REST API directly — AWS Signature V4 over
stdlib ``urllib`` (hmac/sha256 only).  That removes the dependency gate
entirely: the same code path runs against real S3, MinIO, or the
in-process fake server in tests (``tests/integration/test_remote_fakes.py``),
instead of an untestable boto3 branch.

Operations: HEAD/GET/PUT/DELETE object + ListObjectsV2 (path-style
addressing, which MinIO and the fake accept without DNS games).
"""

import datetime
import hashlib
import hmac
import os
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

from marie_tpu.excepts import StorageError
from marie_tpu.storage.manager import PathHandler


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


class SigV4Signer:
    """AWS Signature Version 4 for S3 requests (header auth)."""

    def __init__(self, access_key: str, secret_key: str, region: str):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region

    def sign(
        self,
        method: str,
        url: str,
        headers: Dict[str, str],
        payload: bytes,
        now: Optional[datetime.datetime] = None,
    ) -> Dict[str, str]:
        parsed = urllib.parse.urlsplit(url)
        now = now or datetime.datetime.now(datetime.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        payload_hash = _sha256(payload)

        headers = dict(headers)
        headers["host"] = parsed.netloc
        headers["x-amz-date"] = amz_date
        headers["x-amz-content-sha256"] = payload_hash

        signed_names = sorted(k.lower() for k in headers)
        canonical_headers = "".join(
            f"{k}:{headers[[h for h in headers if h.lower() == k][0]].strip()}\n"
            for k in signed_names
        )
        signed_headers = ";".join(signed_names)
        canonical_query = "&".join(
            sorted(
                f"{urllib.parse.quote(k, safe='')}={urllib.parse.quote(v, safe='')}"
                for k, v in urllib.parse.parse_qsl(
                    parsed.query, keep_blank_values=True
                )
            )
        )
        canonical_request = "\n".join(
            [
                method,
                urllib.parse.quote(parsed.path or "/", safe="/"),
                canonical_query,
                canonical_headers,
                signed_headers,
                payload_hash,
            ]
        )
        scope = f"{datestamp}/{self.region}/s3/aws4_request"
        string_to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                amz_date,
                scope,
                _sha256(canonical_request.encode()),
            ]
        )
        key = _hmac(
            _hmac(
                _hmac(_hmac(b"AWS4" + self.secret_key.encode(), datestamp), self.region),
                "s3",
            ),
            "aws4_request",
        )
        signature = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()
        headers["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        )
        return headers


class S3StorageHandler(PathHandler):
    def __init__(
        self,
        endpoint_url: Optional[str] = None,
        access_key: Optional[str] = None,
        secret_key: Optional[str] = None,
        region: Optional[str] = None,
        timeout: float = 30.0,
    ):
        self.region = region or os.environ.get("AWS_REGION", "us-east-1")
        self.endpoint = (
            endpoint_url
            or os.environ.get("S3_ENDPOINT_URL")
            or f"https://s3.{self.region}.amazonaws.com"
        ).rstrip("/")
        self.signer = SigV4Signer(
            access_key or os.environ.get("AWS_ACCESS_KEY_ID", ""),
            secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
            self.region,
        )
        self.timeout = timeout

    def get_supported_prefixes(self) -> List[str]:
        return ["s3://"]

    @staticmethod
    def _split(path: str) -> Tuple[str, str]:
        rest = path[len("s3://") :]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def _request(
        self,
        method: str,
        bucket: str,
        key: str = "",
        query: str = "",
        payload: bytes = b"",
    ):
        path = f"/{bucket}" + (f"/{urllib.parse.quote(key)}" if key else "")
        url = self.endpoint + path + (f"?{query}" if query else "")
        headers = self.signer.sign(method, url, {}, payload)
        req = urllib.request.Request(url, data=payload or None, method=method)
        for k, v in headers.items():
            if k.lower() != "host":  # urllib sets Host itself
                req.add_header(k, v)
        return urllib.request.urlopen(req, timeout=self.timeout)

    # --- PathHandler ------------------------------------------------------
    def ping(self) -> bool:
        """Reachability probe used by ``StorageManager.ensure_connection``
        (reference ``ensure_connection("s3://")`` before every asset
        restore/store): HEAD the configured bucket; any HTTP answer —
        including 403/404 — proves the endpoint is reachable."""
        bucket = os.environ.get("MARIE_S3_BUCKET", "marie")
        try:
            with self._request("HEAD", bucket):
                return True
        except urllib.error.HTTPError:
            return True  # endpoint answered; auth/bucket issues surface later
        except (urllib.error.URLError, OSError):
            return False

    def exists(self, path: str) -> bool:
        bucket, key = self._split(path)
        try:
            with self._request("HEAD", bucket, key):
                return True
        except urllib.error.HTTPError:
            return False
        except urllib.error.URLError as ex:
            raise StorageError(f"S3 endpoint unreachable: {ex}") from ex

    def read_bytes(self, path: str) -> bytes:
        bucket, key = self._split(path)
        try:
            with self._request("GET", bucket, key) as resp:
                return resp.read()
        except urllib.error.HTTPError as ex:
            raise StorageError(f"S3 GET {path} failed: {ex.code}") from ex
        except urllib.error.URLError as ex:
            raise StorageError(f"S3 endpoint unreachable: {ex}") from ex

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        try:
            with self._request("PUT", bucket, key, payload=data):
                pass
        except urllib.error.HTTPError as ex:
            raise StorageError(f"S3 PUT {path} failed: {ex.code}") from ex
        except urllib.error.URLError as ex:
            raise StorageError(f"S3 endpoint unreachable: {ex}") from ex

    def list(self, path: str) -> List[str]:
        bucket, prefix = self._split(path)
        out: List[str] = []
        token = None
        while True:
            query = "list-type=2&prefix=" + urllib.parse.quote(prefix, safe="")
            if token:
                query += "&continuation-token=" + urllib.parse.quote(token, safe="")
            try:
                with self._request("GET", bucket, query=query) as resp:
                    tree = ET.fromstring(resp.read())
            except urllib.error.HTTPError as ex:
                raise StorageError(f"S3 LIST {path} failed: {ex.code}") from ex
            except urllib.error.URLError as ex:
                raise StorageError(f"S3 endpoint unreachable: {ex}") from ex
            ns = ""
            if tree.tag.startswith("{"):
                ns = tree.tag[: tree.tag.index("}") + 1]
            for contents in tree.findall(f"{ns}Contents"):
                key_el = contents.find(f"{ns}Key")
                if key_el is not None and key_el.text:
                    out.append(f"s3://{bucket}/{key_el.text}")
            token_el = tree.find(f"{ns}NextContinuationToken")
            truncated = tree.find(f"{ns}IsTruncated")
            if (
                token_el is None
                or not token_el.text
                or truncated is None
                or truncated.text != "true"
            ):
                break
            token = token_el.text
        return out

    def delete(self, path: str) -> None:
        bucket, key = self._split(path)
        try:
            with self._request("DELETE", bucket, key):
                pass
        except urllib.error.HTTPError as ex:
            if ex.code != 404:
                raise StorageError(f"S3 DELETE {path} failed: {ex.code}") from ex
        except urllib.error.URLError as ex:
            raise StorageError(f"S3 endpoint unreachable: {ex}") from ex
