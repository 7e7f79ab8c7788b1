"""Variant calling between two genomes (C-Sibelia capability).

Semantics-exact port of the reference driver (reference:
src/csibelia/C-Sibelia.py): classify final-stage synteny blocks into
unique pairs vs repeats, align unique pairs, diff alignment columns into
variants with 30-bp context hysteresis and VCF anchor shifting, and turn
uncovered regions into long indels / insertions / breakends. The LAGAN
subprocess fan-out (C-Sibelia.py:279-292,349-361) is replaced by the
in-process anchored alignment engine (variants/aligner.py).
"""
from __future__ import annotations

import collections
import re

from ..io.fasta import reverse_complement
from .aligner import align_multiple, align_pair

COVER = 1
UNCOVER = 0
LINE_LENGTH = 60
MINIMUM_CONTEXT_SIZE = 30

FastaRecord = collections.namedtuple("FastaRecord", ["seq", "description", "id"])
SyntenyBlock = collections.namedtuple(
    "SyntenyBlock", ["seq", "chr_id", "strand", "id", "start", "end", "chr_num", "chr_size"])
AlignmentRecord = collections.namedtuple("AlignmentRecord", ["body", "block_instance"])


def parse_fasta_file(file_name: str) -> list[FastaRecord]:
    """reference: C-Sibelia.py:98-116 (header kept whole; id = first token)."""
    with open(file_name) as handle:
        line = [ln.strip() for ln in handle if ln.strip() != ""]
    record = []
    i = 0
    while i < len(line):
        if line[i][0] == ">":
            j = i + 1
            while j < len(line) and line[j][0] != ">":
                j += 1
            seq = "".join(line[i + 1:j])
            description = line[i][1:].strip()
            seq_id = description.split()[0]
            record.append(FastaRecord(seq=seq, description=description, id=seq_id))
            i = j
        else:
            i += 1
    return record


def strip_chr_id(chr_id: str) -> str:
    part = chr_id.split("|")
    if len(part) == 5:
        return part[-2].split(".")[0]
    return chr_id


def parse_blocks_coords(blocks_file: str, genome: list[FastaRecord]):
    """reference: C-Sibelia.py:43-82."""
    group: list[list[str]] = [[]]
    num_seq_id: dict[str, str] = {}
    num_seq_size: dict[int, int] = {}
    with open(blocks_file) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in lines:
        if ln[0] == "-":
            group.append([])
        else:
            group[-1].append(ln)
    for ln in group[0][1:]:
        parts = ln.split()
        num_seq_id[parts[0]] = parts[2]
        num_seq_size[int(parts[0])] = int(parts[1])
    ret: dict[int, list[SyntenyBlock]] = {}
    for g in [g for g in group[1:] if g]:
        block_id = int(g[0].split()[1][1:])
        ret[block_id] = []
        for ln in g[2:]:
            parts = ln.split()
            chr_id = num_seq_id[parts[0]]
            start = int(parts[2])
            end = int(parts[3])
            chr_num = int(parts[0])
            strand = parts[1]
            if strand == "+":
                true_start = start - 1
                true_end = end
            else:
                true_start = end - 1
                true_end = start
            seq = genome[chr_num - 1].seq[true_start:true_end]
            if strand == "-":
                seq = reverse_complement(seq)
            ret[block_id].append(SyntenyBlock(
                seq=seq, chr_id=chr_id, strand=strand, id=block_id, start=start,
                end=end, chr_num=chr_num, chr_size=num_seq_size[chr_num]))
    return ret


class Variant:
    """reference: C-Sibelia.py:132-180."""

    def __init__(self, reference_chr_id, reference_pos, contig_id, assembly_pos,
                 reference_allele, assembly_allele, reference_context,
                 assembly_context, synteny_block_id):
        self.reference_chr_id = "." if reference_chr_id is None else reference_chr_id
        self.reference_pos = "." if reference_pos is None else reference_pos
        self.contig_id = str(contig_id)
        self.assembly_pos = assembly_pos
        self.reference_allele = "." if reference_allele is None else reference_allele.upper()
        self.assembly_allele = "." if assembly_allele is None else assembly_allele.upper()
        self.reference_context = "." if reference_context is None else reference_context.upper()
        self.assembly_context = "." if assembly_context is None else assembly_context.upper()
        self.synteny_block_id = "." if synteny_block_id is None else synteny_block_id

    def __str__(self):
        return "\t".join([str(self.reference_pos), self.reference_allele,
                          self.assembly_allele, str(self.synteny_block_id),
                          self.contig_id, self.reference_context,
                          self.assembly_context])

    def get_vcf_record(self):
        data = [strip_chr_id(self.reference_chr_id), str(self.reference_pos),
                ".", self.reference_allele, self.assembly_allele, ".", ".", "."]
        return "\t".join(data)


def no_gaps(sequence: str) -> str:
    return sequence.replace("-", "")


def get_context(alignment, alignment_segment, segment_index):
    """reference: C-Sibelia.py:185-204."""
    context = []
    if segment_index > 0:
        segment = alignment_segment[segment_index - 1]
        start = segment[1] - min(segment[1] - segment[0], MINIMUM_CONTEXT_SIZE)
        context.append(alignment[0][start:segment[1]])
    else:
        context.append("")
    if segment_index + 1 < len(alignment_segment):
        segment = alignment_segment[segment_index + 1]
        end = segment[0] + min(segment[1] - segment[0], MINIMUM_CONTEXT_SIZE)
        context.append(alignment[0][segment[0]:end])
    else:
        context.append("")
    segment = alignment_segment[segment_index]
    reference_context = context[0] + no_gaps(alignment[0][segment[0]:segment[1]]) + context[1]
    assembly_context = context[0] + no_gaps(alignment[1][segment[0]:segment[1]]) + context[1]
    return reference_context, assembly_context


def parse_alignment(alignment, reference_chr_id, synteny_block_id, contig_id,
                    reference_start, reference_direction):
    """reference: C-Sibelia.py:206-252 (alignment passed in-memory)."""
    last_match = None
    start_position = None
    alignment_segment: list[list] = []
    for now_position, symbol in enumerate(zip(alignment[0], alignment[1])):
        now_match = symbol[0] == symbol[1]
        if last_match is None:
            last_match = now_match
            start_position = 0
        elif last_match != now_match:
            if (last_match is False or now_position - start_position >= MINIMUM_CONTEXT_SIZE
                    or start_position == 0):
                alignment_segment.append([start_position, now_position, last_match])
                start_position = now_position
            elif alignment_segment:
                start_position = alignment_segment[-1][0]
                del alignment_segment[-1]
            last_match = now_match

    alignment_segment.append([start_position, len(alignment[0]), last_match])
    position = reference_start
    reference_position_map = []
    for symbol in alignment[0]:
        reference_position_map.append(position)
        position += reference_direction if symbol != "-" else 0

    variant = []
    for segment_index, segment in enumerate(alignment_segment):
        start, end, match = segment
        if match is False:
            shift = 1
            variant_reference_start = reference_position_map[start]
            reference_context, assembly_context = get_context(
                alignment, alignment_segment, segment_index)
            snp = (end - start == 1 and alignment[0][start] != "-"
                   and alignment[1][start] != "-")
            if start == 0 or snp:
                shift = 0
            reference_allele = no_gaps(alignment[0][start - shift:end])
            assembly_allele = no_gaps(alignment[1][start - shift:end])
            if reference_direction == -1:
                reference_allele = reverse_complement(reference_allele)
                assembly_allele = reverse_complement(assembly_allele)
            variant.append(Variant(reference_chr_id, variant_reference_start - shift,
                                   contig_id, None, reference_allele, assembly_allele,
                                   reference_context, assembly_context,
                                   synteny_block_id))
    return variant


def find_instance(instance_list, reference_seq_id, in_reference):
    for instance in instance_list:
        if (instance.chr_id in reference_seq_id) == in_reference:
            return instance
    return None


def get_size(record):
    return abs(record.end - record.start) + 1


def determine_unique_block(instance_list, reference_seq, min_block_size):
    """reference: C-Sibelia.py:314-323."""
    if len(instance_list) == 2:
        reference_instance = find_instance(instance_list, reference_seq.keys(), True)
        assembly_instance = find_instance(instance_list, reference_seq.keys(), False)
        if reference_instance is not None and assembly_instance is not None:
            if (get_size(reference_instance) >= min_block_size
                    and get_size(assembly_instance) >= min_block_size):
                return reference_instance, assembly_instance
    return None, None


def process_block(block):
    """reference: C-Sibelia.py:274-309, with in-process aligners.

    Unique pairs default to the exact LAGAN engine (byte-identical to
    ``lagan.pl -mfa``; align/lagan_exact.py).  SIBELIA_TPU_ALIGNER=fast
    selects the anchored-Gotoh engine instead, and with it
    SIBELIA_TPU_DEVICE_ALIGN=1 routes gap subproblems through the batched
    device kernel (identical to the fast host path)."""
    import os
    unique, synteny_block_id, instance_list = block
    if unique:
        ref_inst, asm_inst = instance_list
        mode = os.environ.get("SIBELIA_TPU_ALIGNER", "exact")
        from ..align import lagan_exact
        if mode == "exact" and lagan_exact.available():
            # reference: C-Sibelia.py:283 builds these description headers
            name0 = ref_inst.chr_id + str(ref_inst.start) + "_" + str(ref_inst.end)
            name1 = asm_inst.chr_id + str(asm_inst.start) + "_" + str(asm_inst.end)
            row0, row1 = lagan_exact.align_pair_exact(
                ref_inst.seq, asm_inst.seq, name0, name1)
        elif os.environ.get("SIBELIA_TPU_DEVICE_ALIGN") == "1":
            from .aligner import device_gap_batching
            with device_gap_batching():
                row0, row1 = align_pair(ref_inst.seq, asm_inst.seq)
        else:
            row0, row1 = align_pair(ref_inst.seq, asm_inst.seq)
        rows = [row0, row1]
    else:
        mode = os.environ.get("SIBELIA_TPU_ALIGNER", "exact")
        from ..align import mlagan_exact
        if mode == "exact" and mlagan_exact.available():
            # exact mlagan port; alignment records keep the reference's
            # output order (the guide-tree merge order, C-Sibelia.py:295)
            names = [inst.chr_id + str(inst.start) + "_" + str(inst.end)
                     for inst in instance_list]
            by_name = dict(zip(names, instance_list))
            fasta = mlagan_exact.mlagan_fasta(
                [inst.seq.encode() if isinstance(inst.seq, str) else inst.seq
                 for inst in instance_list], names)
            records = []
            cur_name, cur = None, []
            for line in fasta.split("\n"):
                if line.startswith(">"):
                    if cur_name is not None:
                        records.append((cur_name, "".join(cur)))
                    cur_name, cur = line[1:], []
                elif line:
                    cur.append(line)
            if cur_name is not None:
                records.append((cur_name, "".join(cur)))
            alignment = [AlignmentRecord(body=body,
                                         block_instance=by_name[nm])
                         for nm, body in records]
            return [], alignment
        rows = align_multiple([inst.seq for inst in instance_list])
    alignment = [AlignmentRecord(body=body, block_instance=inst)
                 for body, inst in zip(rows, instance_list)]
    ret = []
    if unique:
        reference_instance, assembly_instance = instance_list
        reference_direction = +1 if reference_instance.strand == "+" else -1
        ret = parse_alignment([rows[0], rows[1]], reference_instance.chr_id,
                              synteny_block_id, assembly_instance.chr_id,
                              reference_instance.start, reference_direction)
    return ret, alignment


def depict_coverage(block_seq, reference_seq, assembly_seq, base_cover):
    """reference: C-Sibelia.py:325-338."""
    if base_cover is None:
        base_cover = {}
        for seq_group in (reference_seq, assembly_seq):
            for seq_id, seq in seq_group.items():
                base_cover[seq_id] = [UNCOVER for _ in seq]
    for block_id, instance_list in block_seq.items():
        reference = [inst for inst in instance_list if inst.chr_id in reference_seq]
        if reference and len(reference) < len(instance_list):
            for instance in instance_list:
                start = min(instance.start, instance.end) - 1
                end = max(instance.start, instance.end)
                base_cover[instance.chr_id][start:end] = [block_id] * (end - start)
    return base_cover


def _coords_key(file_name):
    return int(file_name.split(".")[0][13:])


def call_variants(directory, genomes, reference_seq, assembly_seq,
                  min_block_size, align=False):
    """reference: C-Sibelia.py:343-427."""
    import os
    coords_re = re.compile(r"blocks_coords[0-9]*\.txt")
    coords_files = [f for f in os.listdir(directory) if coords_re.match(f)]
    coords_files.sort(key=_coords_key)
    blocks_coords = [parse_blocks_coords(os.path.join(directory, f), genomes)
                     for f in coords_files]

    annotated_block = []
    for synteny_block_id, instance_list in blocks_coords[-1].items():
        unique = False
        if len(instance_list) == 2:
            ref_inst, asm_inst = determine_unique_block(
                instance_list, reference_seq, min_block_size)
            if ref_inst is not None:
                unique = True
                instance_list = [ref_inst, asm_inst]
        annotated_block.append((unique, synteny_block_id, instance_list))

    variant: list[Variant] = []
    alignment: list[list[AlignmentRecord]] = []
    for block in annotated_block:
        v, a = process_block(block)
        variant.extend(v)
        alignment.append(a)

    all_cover = None
    for stage in blocks_coords:
        all_cover = depict_coverage(stage, reference_seq, assembly_seq, all_cover)
    block_seq = blocks_coords[-1]
    main_cover = depict_coverage(block_seq, reference_seq, assembly_seq, None)
    insertion: list[Variant] = []
    # reference: C-Sibelia.py:380 iterates the py2 dict; the order decides
    # breakend numbering and equal-(chr,pos) stable-sort ties
    from ..core.py2_dict import py2_dict_key_order
    for seq_id in py2_dict_key_order(list(all_cover.keys())):
        cover = all_cover[seq_id]
        i = 0
        while i < len(cover):
            if cover[i] == UNCOVER:
                start = i
                while i < len(cover) and cover[i] == UNCOVER:
                    i += 1
                end = i
                if end - start > min_block_size:
                    if seq_id not in reference_seq:
                        reference_chr_id = None
                        reference_pos = None
                        reference_allele = None
                        assembly_allele = assembly_seq[seq_id][start:end]
                        if start > 0:
                            prev_block_id = main_cover[seq_id][start - 1]
                            if prev_block_id != UNCOVER:
                                instance_list = block_seq[prev_block_id]
                                ref_inst, asm_inst = determine_unique_block(
                                    instance_list, reference_seq, min_block_size)
                                if ref_inst is not None:
                                    if ref_inst.strand == asm_inst.strand:
                                        reference_pos = max(ref_inst.start, ref_inst.end)
                                    else:
                                        reference_pos = min(ref_inst.start, ref_inst.end) - 1
                                    chr_id = ref_inst.chr_id
                                    if reference_pos > 0:
                                        common_char = reference_seq[chr_id][reference_pos - 1]
                                        reference_allele = common_char
                                        assembly_allele = common_char + assembly_allele
                                        reference_chr_id = chr_id
                                    else:
                                        reference_pos = None
                        variant_type = insertion if reference_pos is None else variant
                        variant_type.append(Variant(
                            reference_chr_id, reference_pos, seq_id, start,
                            reference_allele, assembly_allele,
                            reference_allele, assembly_allele, None))
                    else:
                        common_char = reference_seq[seq_id][start - 1] if start > 0 else ""
                        assembly_allele = common_char if common_char else None
                        reference_allele = common_char + reference_seq[seq_id][start:end]
                        variant.append(Variant(seq_id, start, None, None,
                                               reference_allele, assembly_allele,
                                               reference_allele, assembly_allele, None))
            else:
                i += 1

    return variant, insertion, alignment


# -- output writers ---------------------------------------------------------

def _write_wrapped(text, handle):
    pos = 0
    while pos < len(text):
        end = min(pos + LINE_LENGTH, len(text))
        handle.write(text[pos:end] + "\n")
        pos = end


def write_vcf_header(reference, handle):
    """reference: C-Sibelia.py:433-440 (version string kept for parity)."""
    handle.write("##fileformat=VCFv4.1\n")
    handle.write("##source=C-Sibelia 3.0.5\n")
    handle.write("##reference=" + strip_chr_id(reference.id) + "\n")
    handle.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">\n')
    handle.write('##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="Imprecise structural variation">\n')
    handle.write('##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="Confidence interval around POS for imprecise variants">\n')
    handle.write("\t".join(["#CHROM", "POS", "ID", "REF", "ALT", "QUAL",
                            "FILTER", "INFO"]) + "\n")


def write_variants_vcf(variant_list, handle):
    for v in variant_list:
        handle.write(v.get_vcf_record() + "\n")


def write_insertions_vcf(variant_list, reference_organism, handle):
    """reference: C-Sibelia.py:446-463 (breakend records)."""
    ref_len = str(len(reference_organism.seq))
    reference_chr = strip_chr_id(reference_organism.id)
    for index, v in enumerate(variant_list):
        ref_pos = "1"
        ref_allele = reference_organism.seq[0]
        contig = v.contig_id
        assembly_start = v.assembly_pos + 1
        assembly_end = assembly_start + len(v.assembly_allele)
        start_alt = ref_allele + "[" + contig + ":" + str(assembly_start) + "["
        end_alt = "]" + contig + ":" + str(assembly_end) + "]" + ref_allele
        info = ";".join(("IMPRECISE", "SVTYPE=BND", "CIPOS=0," + ref_len))
        for bnd, alt in ((f"bnd_{index * 2}", start_alt),
                         (f"bnd_{index * 2 + 1}", end_alt)):
            handle.write("\t".join([reference_chr, ref_pos, bnd, ref_allele,
                                    alt, ".", ".", info]) + "\n")


def write_alignments_maf(alignment_list, handle):
    """reference: C-Sibelia.py:473-484."""
    handle.write("##maf version=1\n\n")
    for group in alignment_list:
        handle.write("a\n")
        for alignment in group:
            block = alignment.block_instance
            start = min(block.start, block.end) - 1
            end = max(block.start, block.end)
            if block.strand != "+":
                start = block.chr_size - end
            handle.write(f"s {block.chr_id} {start} "
                         f"{abs(block.end - block.start) + 1} {block.strand} "
                         f"{block.chr_size} {alignment.body}\n")
        handle.write("\n")


def write_alignments_xmfa(alignment_list, handle):
    """reference: C-Sibelia.py:465-471."""
    for group in alignment_list:
        for alignment in group:
            block = alignment.block_instance
            handle.write(">%i:%i-%i %s %s\n" % (block.chr_num, block.start,
                                                block.end, block.strand,
                                                block.chr_id))
            _write_wrapped(alignment.body, handle)
        handle.write("=\n")


def write_insertions_text(variant_list, handle):
    handle.write("\t".join(["SEQ_ID", "POS", "FRAGMENT"]) + "\n")
    for v in variant_list:
        handle.write("\t".join([v.contig_id, str(v.assembly_pos + 1),
                                v.assembly_allele]) + "\n")


def write_insertions_fasta(variant_list, file_name):
    with open(file_name, "w") as handle:
        for v in variant_list:
            start = str(v.assembly_pos + 1)
            end = str(v.assembly_pos + len(v.assembly_allele))
            description = ('Seq="' + v.contig_id + '",Start=' + start
                           + '",End=' + end)
            handle.write(">" + description + "\n")
            _write_wrapped(v.assembly_allele, handle)


def variant_key(v: Variant):
    return (v.reference_chr_id, v.reference_pos)
