"""RFC-822 email (.eml) text extraction — pure stdlib ``email`` package.

Parity target: Tika's RFC822Parser (reached through the reference's
AutoDetectParser, /root/reference/.../ExtractTextProcessor.java:173)
emits the subject/from/to header lines followed by the decoded body;
multipart messages contribute their text/plain parts (text/html parts
fall back to the HTML extractor); attachments are skipped.
"""

from __future__ import annotations

import email
import email.policy
from email.message import EmailMessage

from .html import html_to_text


def _part_text(part: EmailMessage) -> str | None:
    ctype = part.get_content_type()
    if ctype == "text/plain":
        return part.get_content()
    if ctype == "text/html":
        payload = part.get_payload(decode=True)
        if payload is None:
            return None
        return html_to_text(payload)
    return None


def extract_eml_text(data: bytes) -> str:
    """Header summary (Subject/From/To lines, present ones only), blank
    line, then body text of every inline text part in message order."""
    msg = email.message_from_bytes(data, policy=email.policy.default)
    if not (msg.get("From") or msg.get("Subject") or msg.get("To")):
        raise ValueError("not an RFC-822 message: no From/Subject/To headers")
    lines = [f"{h}: {msg[h]}" for h in ("Subject", "From", "To") if msg[h]]
    bodies: list[str] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        if (part.get_content_disposition() or "inline") != "inline":
            continue  # skip attachments, like Tika's default handler
        text = _part_text(part)
        if text:
            bodies.append(text.rstrip("\n"))
    out = "\n".join(lines)
    if bodies:
        out += "\n\n" + "\n".join(bodies)
    return out.rstrip() + "\n"
