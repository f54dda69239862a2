"""Extract the reference's embedded JPEG test assets (xxd -i byte arrays) into .jpg files.

The reference embeds its golden-test images as C byte arrays (see
/root/reference/test/test.cpp:52 and the four *.h asset headers). This script
parses the hex bytes back into the original JPEG files so our test suite can
use them directly. Run once; outputs are committed under tests/assets/.
"""
import re, sys, pathlib

SRC = pathlib.Path("/root/reference/test")
DST = pathlib.Path(__file__).resolve().parent.parent / "tests" / "assets"
DST.mkdir(parents=True, exist_ok=True)

FILES = {
    "Pterois_volitans_Manado-e_edit_smallest.h": "fish.jpg",
    "edges.h": "golden_edges.jpg",
    "linesDark.h": "golden_lines_dark.jpg",
    "linesBright.h": "golden_lines_bright.jpg",
}

for src, dst in FILES.items():
    text = (SRC / src).read_text()
    body = text[text.index("{") + 1 : text.index("}")]
    data = bytes(int(tok, 16) for tok in re.findall(r"0x[0-9a-fA-F]{2}", body))
    (DST / dst).write_bytes(data)
    print(dst, len(data), "bytes")
