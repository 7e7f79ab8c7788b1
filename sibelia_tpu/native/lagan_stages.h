// Internal API between the three LAGAN stage translation units.
#ifndef SIBELIA_TPU_LAGAN_STAGES_H
#define SIBELIA_TPU_LAGAN_STAGES_H

#include <array>
#include <string>
#include <vector>

#include "lagan_common.h"

namespace lagan {

// chaos over a list of 1-based inclusive region pairs (the -pairs protocol,
// fchaos.c:743-776); appends the reference binary's stdout text to *out.
void chaos_pairs(const MappedSeq& s1, const char* name1, const MappedSeq& s2,
                 const char* name2,
                 const std::vector<std::array<int, 4>>& pairs, int wl, int nd,
                 int co, int rsc, bool gfc, bool ext, std::string* out);

// anchors: parses chaos-format hit text, selects the maximal consistent
// chain, appends the anchor lines (reference: anchors.c stdout format).
void anchors_text(const std::string& hits_text, bool gfc, std::string* out);

// order: anchored banded global alignment; anchors_text holds the sorted
// anchor lines handed to -anc.  Appends the -mfa output.
void order_mfa(const MappedSeq& s1, const char* name1, const MappedSeq& s2,
               const char* name2, const std::string& anchors_text,
               std::string* out);

}  // namespace lagan

#endif  // SIBELIA_TPU_LAGAN_STAGES_H
