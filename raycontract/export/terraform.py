"""Contract → Terraform (AWS S3 bucket) exporter.

≅ the reference's ``export/terraform_converter.py``: one aws_s3_bucket
resource per s3 server, tagged with contract id/title/server name and
optional DataProduct.
"""

from __future__ import annotations

import re

from raycontract.contract import DataContractSpecification, Server


def _bucket_name(server: Server) -> str:
    loc = server.location or server.path or ""
    m = re.match(r"^s3://([^/]+)", loc)
    return m.group(1) if m else loc


def export_terraform(spec: DataContractSpecification, server_id: str | None = None) -> str:
    out = []
    for name, server in spec.servers.items():
        if server_id is not None and name != server_id:
            continue
        if server.type != "s3":
            continue
        tags = [
            f'    Name         = "{spec.info.title}"',
            f'    DataContract = "{spec.id}"',
            f'    Server       = "{name}"',
        ]
        if server.dataProductId is not None:
            tags.append(f'    DataProduct  = "{server.dataProductId}"')
        out.append(
            f'resource "aws_s3_bucket" "{spec.id}_{name}" {{\n'
            f'  bucket = "{_bucket_name(server)}"\n\n'
            "  tags = {\n" + "\n".join(tags) + "\n  }\n}"
        )
    return "\n\n".join(out).strip()
