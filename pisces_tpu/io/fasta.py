"""Indexed FASTA + GenomeSize.xml access.

Mirrors the reference Genome / GenomeMetadata contracts
(src/lib/Pisces.IO/Genome.cs:40-96, src/lib/Common.IO/GenomeMetadata.cs):
a genome folder must contain GenomeSize.xml and FASTA(s) with .fai indexes;
chromosome sequences are served as whole uppercase byte arrays.
"""
from __future__ import annotations

import os
import threading
import xml.etree.ElementTree as ET
from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class FaiEntry:
    name: str
    length: int
    offset: int
    line_bases: int
    line_width: int


def read_fai(path: str) -> Dict[str, FaiEntry]:
    entries = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5:
                continue
            entries[parts[0]] = FaiEntry(parts[0], int(parts[1]), int(parts[2]),
                                         int(parts[3]), int(parts[4]))
    return entries


_FASTA_SCAN_CACHE: dict = {}


def _scan_fasta(fasta_path: str) -> Dict[str, Tuple[int, int]]:
    """Locate each record's sequence byte range [start, end) by scanning for
    '>' headers. Robust to CRLF and .fai offset drift (some shipped test
    genomes have stale indexes)."""
    cached = _FASTA_SCAN_CACHE.get(fasta_path)
    if cached is not None:
        return cached
    ranges: Dict[str, Tuple[int, int]] = {}
    with open(fasta_path, "rb") as f:
        data = f.read()
    pos = 0
    n = len(data)
    pending_name = None
    pending_start = 0
    while pos < n:
        nl = data.find(b"\n", pos)
        if nl < 0:
            nl = n
        if data[pos:pos + 1] == b">":
            if pending_name is not None:
                ranges[pending_name] = (pending_start, pos)
            header = data[pos + 1:nl].strip().split()
            pending_name = header[0].decode() if header else ""
            pending_start = nl + 1
            pos = nl + 1
        else:
            # skip to the next header fast
            nxt = data.find(b"\n>", pos)
            if nxt < 0:
                pos = n
            else:
                pos = nxt + 1
    if pending_name is not None:
        ranges[pending_name] = (pending_start, n)
    _FASTA_SCAN_CACHE[fasta_path] = ranges
    return ranges


_CHR_LOAD_CACHE: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
_CHR_LOAD_LOCK = threading.Lock()
_CHR_LOAD_CAP = 4
# byte budget: a whole-genome sweep must not retain ~1 GB of finished
# chromosomes for the process lifetime (the WGS bench commits peak RSS);
# small test/panel genomes still enjoy the full 4-entry reuse
_CHR_LOAD_MAX_BYTES = 256 * 1024 * 1024


def load_chromosome(fasta_path: str, entry: FaiEntry) -> np.ndarray:
    """Load one chromosome as an uppercase uint8 array (ASCII).

    Cross-instance cache: tools that construct a fresh Genome per
    invocation (gemini, scylla, satellites) were re-reading the same
    FASTA every call (~19ms/run of the warm gemini profile on chr19).
    Keyed by (path, name, mtime, size) so an edited FASTA invalidates;
    the cached array is marked read-only — callers treat references as
    immutable everywhere (ChrReference hands out copies via substr)."""
    try:
        st = os.stat(fasta_path)
        key = (os.path.abspath(fasta_path), entry.name, st.st_mtime_ns,
               st.st_size)
    except OSError:
        key = None
    if key is not None:
        with _CHR_LOAD_LOCK:
            hit = _CHR_LOAD_CACHE.get(key)
            if hit is not None:
                _CHR_LOAD_CACHE.move_to_end(key)
                return hit
    seq = _load_chromosome_uncached(fasta_path, entry)
    seq.flags.writeable = False
    if key is not None:
        with _CHR_LOAD_LOCK:
            _CHR_LOAD_CACHE[key] = seq
            while len(_CHR_LOAD_CACHE) > _CHR_LOAD_CAP or (
                    len(_CHR_LOAD_CACHE) > 1
                    and sum(a.nbytes for a in _CHR_LOAD_CACHE.values())
                    > _CHR_LOAD_MAX_BYTES):
                _CHR_LOAD_CACHE.popitem(last=False)
    return seq


# one-pass cleanup table: uppercase a-z, used with delete=b"\r\n" so the
# whole strip+uppercase is a single C-speed bytes.translate
_UPPER_TABLE = bytes(
    c - 32 if ord("a") <= c <= ord("z") else c for c in range(256))


def _load_chromosome_uncached(fasta_path: str, entry: FaiEntry) -> np.ndarray:
    seq = _load_via_fai(fasta_path, entry)
    if seq is None:  # stale/absent .fai layout: scan the whole file
        ranges = _scan_fasta(fasta_path)
        if entry.name not in ranges:
            raise KeyError(f"{entry.name} not found in {fasta_path}")
        start, end = ranges[entry.name]
        with open(fasta_path, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        cleaned = data.translate(_UPPER_TABLE, b"\r\n")
        if len(cleaned) < entry.length:
            raise ValueError(f"{entry.name}: expected {entry.length} bases, "
                             f"found {len(cleaned)}")
        return np.frombuffer(cleaned, np.uint8)[:entry.length]
    # .fai fast path delivers raw sequence bytes; uppercase only when a
    # lowercase (soft-masked) reference actually needs it
    if seq.max(initial=0) >= ord("a"):
        if not seq.flags.writeable:
            seq = seq.copy()
        lower = (seq >= ord("a")) & (seq <= ord("z"))
        seq[lower] -= 32
    return seq


def _load_via_fai(fasta_path: str, entry: FaiEntry) -> Optional[np.ndarray]:
    """Direct .fai-indexed load: seek to the entry's offset and strip
    newlines by RESHAPE over the uniform line layout (two memcpys instead
    of a whole-file scan + boolean mask — the scan dominated the
    cold-start profile at ~26ms for a 3MB genome). Returns None when the
    .fai layout does not validate against the file (some shipped test
    genomes carry stale indexes — the scan path handles those)."""
    blen, wid = entry.line_bases, entry.line_width
    if blen <= 0 or wid <= blen or entry.offset <= 0:
        return None
    full, rem = divmod(entry.length, blen)
    nbytes = full * wid + (rem + (wid - blen) if rem else 0)
    try:
        with open(fasta_path, "rb") as f:
            # validate: the bytes immediately before offset must be a
            # header line naming this contig
            back = min(entry.offset, 256)
            f.seek(entry.offset - back)
            head = f.read(back)
            gt = head.rfind(b">")
            nm = entry.name.encode()
            rest = head[gt + 1:] if gt >= 0 else b""
            # the name must be FOLLOWED by whitespace/newline: 'chr1'
            # must not validate against a '>chr10' header
            if (gt < 0 or not rest.startswith(nm)
                    or rest[len(nm):len(nm) + 1] not in
                    (b" ", b"\t", b"\r", b"\n")):
                return None
            raw = f.read(nbytes)
    except OSError:
        return None
    if len(raw) < nbytes:
        return None
    arr = np.frombuffer(raw, np.uint8)
    grid = arr[:full * wid].reshape(full, wid)
    body = grid[:, :blen]
    if full:
        # terminator columns must be newline bytes (\n, or \r\n) or the
        # .fai layout is stale
        nl = grid[:, blen:]
        if int(nl.min()) < ord("\n") or int(nl.max()) > ord("\r"):
            return None
    if rem:
        out = np.empty(entry.length, np.uint8)
        out[:full * blen] = body.ravel()
        out[full * blen:] = arr[full * wid:full * wid + rem]
        return out
    return np.ascontiguousarray(body).reshape(-1)


@dataclass
class ChrReference:
    name: str
    sequence: np.ndarray  # uint8 ASCII, uppercase

    @property
    def length(self) -> int:
        return len(self.sequence)

    def substr(self, start0: int, length: int) -> str:
        return self.sequence[start0:start0 + length].tobytes().decode()


class Genome:
    """Genome folder access (GenomeSize.xml + FASTA + .fai)."""

    def __init__(self, directory: str, chrs_to_process: Optional[List[str]] = None):
        self.directory = directory
        xml_path = os.path.join(directory, "GenomeSize.xml")
        if not os.path.exists(xml_path):
            raise FileNotFoundError(f"Cannot find GenomeSize.xml in {directory}")
        root = ET.parse(xml_path).getroot()
        self.name = root.get("genomeName", os.path.basename(directory))
        self._chrom_info: List[Tuple[str, str, int]] = []  # (contig, fasta file, len)
        for el in root.findall("chromosome"):
            contig = el.get("contigName")
            if chrs_to_process and contig not in chrs_to_process:
                continue
            self._chrom_info.append((contig, el.get("fileName"), int(el.get("totalBases"))))
        self._fai_cache: Dict[str, Dict[str, FaiEntry]] = {}
        # Small LRU of loaded chromosomes: the reference holds one
        # ChrReference per (bam, chr) job for the job's whole lifetime
        # (Genome.cs:40-96); re-reading the FASTA per call dominated the
        # warm end-to-end profile (~18ms of 34ms on chr19). Capacity is
        # bounded so whole-genome sweeps stay at working-set memory.
        self._chr_cache: "OrderedDict[str, ChrReference]" = OrderedDict()
        self._chr_cache_lock = threading.Lock()
        self._chr_cache_cap = 4

    @property
    def chromosome_names(self) -> List[str]:
        return [c for c, _, _ in self._chrom_info]

    @property
    def chromosome_lengths(self) -> List[Tuple[str, int]]:
        return [(c, n) for c, _, n in self._chrom_info]

    def get_chr_reference(self, name: str) -> ChrReference:
        with self._chr_cache_lock:
            hit = self._chr_cache.get(name)
            if hit is not None:
                self._chr_cache.move_to_end(name)
                return hit
        ref = self._load_chr_reference(name)
        with self._chr_cache_lock:
            self._chr_cache[name] = ref
            while len(self._chr_cache) > self._chr_cache_cap:
                self._chr_cache.popitem(last=False)
        return ref

    def evict_chr_reference(self, name: str) -> None:
        """Drop a chromosome from the LRU (callers with their own
        lifetime accounting — e.g. the scheduler's ChrReferenceCache —
        use this so released references are actually freed)."""
        with self._chr_cache_lock:
            self._chr_cache.pop(name, None)

    def _load_chr_reference(self, name: str) -> ChrReference:
        for contig, fa_file, _ in self._chrom_info:
            if contig == name:
                fa_path = os.path.join(self.directory, fa_file)
                fai_path = fa_path + ".fai"
                if fa_path not in self._fai_cache:
                    if not os.path.exists(fai_path):
                        raise FileNotFoundError(f"Missing index {fai_path}")
                    self._fai_cache[fa_path] = read_fai(fai_path)
                entry = self._fai_cache[fa_path][name]
                return ChrReference(name, load_chromosome(fa_path, entry))
        raise KeyError(f"Chromosome {name} not in genome {self.directory}")


def write_fai(fa_path: str) -> str:
    """Build a samtools-compatible .fai for a FASTA with uniform line length."""
    out = fa_path + ".fai"
    entries = []
    with open(fa_path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        if data[pos:pos + 1] != b">":
            raise ValueError(f"malformed FASTA at byte {pos} in {fa_path}")
        eol = data.index(b"\n", pos)
        name = data[pos + 1:eol].split()[0].decode()
        seq_start = eol + 1
        next_hdr = data.find(b">", seq_start)
        block = data[seq_start:None if next_hdr < 0 else next_hdr]
        first_nl = block.find(b"\n")
        line_bases = first_nl if first_nl >= 0 else len(block)
        first_line = block[:line_bases]
        if first_line.endswith(b"\r"):
            line_bases -= 1
        line_width = (first_nl + 1) if first_nl >= 0 else len(block)
        length = len(block.replace(b"\n", b"").replace(b"\r", b""))
        entries.append(f"{name}\t{length}\t{seq_start}\t{line_bases}\t{line_width}")
        pos = next_hdr if next_hdr >= 0 else len(data)
    with open(out, "w") as f:
        f.write("\n".join(entries) + "\n")
    return out


def create_genome_size_xml(directory: str, out_path: Optional[str] = None,
                           genome_name: Optional[str] = None) -> str:
    """CreateGenomeSizeFile tool equivalent (src/tools/CreateGenomeSizeFile
    Program.cs:33-52): generate GenomeSize.xml from the FASTA files in a
    folder, creating missing .fai indexes along the way."""
    import glob
    import hashlib
    lines = []
    fas = sorted(glob.glob(os.path.join(directory, "*.fa")) +
                 glob.glob(os.path.join(directory, "*.fasta")))
    if not fas:
        raise FileNotFoundError(f"no FASTA files in {directory}")
    genome_name = genome_name or os.path.basename(os.path.abspath(directory))
    for fa in fas:
        fai = fa + ".fai"
        if not os.path.exists(fai):
            write_fai(fa)
        with open(fa, "rb") as f:
            md5 = hashlib.md5(f.read()).hexdigest()
        for name, e in read_fai(fai).items():
            lines.append(
                f'\t<chromosome fileName="{os.path.basename(fa)}" contigName="{name}" '
                f'totalBases="{e.length}" isCircular="false" md5="{md5}" ploidy="2" '
                f'knownBases="{e.length}" />')
    xml = (f'<sequenceSizes genomeName="{genome_name}">\n' + "\n".join(lines)
           + "\n</sequenceSizes>")
    out_path = out_path or os.path.join(directory, "GenomeSize.xml")
    with open(out_path, "w") as f:
        f.write(xml)
    return out_path
