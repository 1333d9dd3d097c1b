"""S3 path handler (reference: marie/storage/s3_storage.py:98).

boto3 is not present in this environment; the handler is import-gated and
raises a clear error when used without boto3, while registering cleanly so
configs that mention ``s3://`` paths still parse.
"""

from typing import List, Optional

from marie_tpu.excepts import StorageError
from marie_tpu.storage.manager import PathHandler


class S3StorageHandler(PathHandler):
    def __init__(
        self,
        endpoint_url: Optional[str] = None,
        access_key: Optional[str] = None,
        secret_key: Optional[str] = None,
        region: Optional[str] = None,
    ):
        try:
            import boto3  # noqa: F401

            self._client = boto3.client(
                "s3",
                endpoint_url=endpoint_url,
                aws_access_key_id=access_key,
                aws_secret_access_key=secret_key,
                region_name=region,
            )
        except ImportError:
            self._client = None

    def get_supported_prefixes(self) -> List[str]:
        return ["s3://"]

    def _require(self):
        if self._client is None:
            raise StorageError(
                "s3:// paths require boto3, which is not installed"
            )
        return self._client

    @staticmethod
    def _split(path: str):
        rest = path[len("s3://") :]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def exists(self, path: str) -> bool:
        client = self._require()
        bucket, key = self._split(path)
        try:
            client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:  # noqa: BLE001
            return False

    def read_bytes(self, path: str) -> bytes:
        client = self._require()
        bucket, key = self._split(path)
        return client.get_object(Bucket=bucket, Key=key)["Body"].read()

    def write_bytes(self, path: str, data: bytes) -> None:
        client = self._require()
        bucket, key = self._split(path)
        client.put_object(Bucket=bucket, Key=key, Body=data)

    def list(self, path: str) -> List[str]:
        client = self._require()
        bucket, prefix = self._split(path)
        out = []
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            for item in page.get("Contents", []):
                out.append(f"s3://{bucket}/{item['Key']}")
        return out

    def delete(self, path: str) -> None:
        client = self._require()
        bucket, key = self._split(path)
        client.delete_object(Bucket=bucket, Key=key)
