"""Outlook .msg ([MS-OXMSG]) text extraction — pure stdlib.

Parity target: the reference routes every format through Tika's
AutoDetectParser (/root/reference/.../ExtractTextProcessor.java:158,173),
whose OutlookExtractor reads the OLE2 property streams. A .msg file is
an OLE2 compound document whose string properties live in streams named
``__substg1.0_<tag><type>`` — tag = MAPI property id, type = 001F
(UTF-16LE) or 001E (ANSI).

Output mirrors the RFC-822 extractor (email_msg.py): header block
(Subject/From/To/Cc when present), blank line, body.
"""

from __future__ import annotations

from .ole2 import Ole2File

# MAPI property tags (string properties used by Tika's OutlookExtractor)
TAG_SUBJECT = "0037"
TAG_SENDER_NAME = "0C1A"
TAG_SENDER_EMAIL = "5D01"  # PidTagSenderSmtpAddress
TAG_TO_DISPLAY = "0E04"
TAG_CC_DISPLAY = "0E03"
TAG_BODY = "1000"


def _string_prop(ole: Ole2File, names: set[str], tag: str) -> str | None:
    for suffix, enc in (("001F", "utf-16-le"), ("001E", "cp1252")):
        name = f"__substg1.0_{tag}{suffix}"
        if name in names:
            raw = ole.read_stream(name)
            return raw.decode(enc, "replace").rstrip("\x00")
    return None


def is_msg(streams: list[str]) -> bool:
    """OLE2 container holds MAPI property streams → Outlook message."""
    return any(s.startswith(("__substg1.0_", "__properties_version1.0"))
               for s in streams)


def msg_headers(data: bytes) -> dict[str, str]:
    """Tika-keyed message metadata for B3 ExtractMediaMetadata."""
    ole = Ole2File(data)
    names = set(ole.list_streams())
    out: dict[str, str] = {}
    subject = _string_prop(ole, names, TAG_SUBJECT)
    if subject:
        out["dc:title"] = subject
    sender = (_string_prop(ole, names, TAG_SENDER_NAME)
              or _string_prop(ole, names, TAG_SENDER_EMAIL))
    if sender:
        out["Message-From"] = sender
    to = _string_prop(ole, names, TAG_TO_DISPLAY)
    if to:
        out["Message-To"] = to
    cc = _string_prop(ole, names, TAG_CC_DISPLAY)
    if cc:
        out["Message-Cc"] = cc
    return out


def extract_msg_text(data: bytes) -> str:
    ole = Ole2File(data)
    names = set(ole.list_streams())
    if not is_msg(list(names)):
        raise ValueError("OLE2 file is not an Outlook message")
    headers: list[str] = []
    subject = _string_prop(ole, names, TAG_SUBJECT)
    if subject is not None:
        headers.append(f"Subject: {subject}")
    sender = (_string_prop(ole, names, TAG_SENDER_NAME)
              or _string_prop(ole, names, TAG_SENDER_EMAIL))
    if sender is not None:
        headers.append(f"From: {sender}")
    to = _string_prop(ole, names, TAG_TO_DISPLAY)
    if to is not None:
        headers.append(f"To: {to}")
    cc = _string_prop(ole, names, TAG_CC_DISPLAY)
    if cc:
        headers.append(f"Cc: {cc}")
    body = _string_prop(ole, names, TAG_BODY) or ""
    head = "\n".join(headers)
    text = (head + "\n\n" + body) if head else body
    return text.rstrip() + ("\n" if text.strip() else "")
