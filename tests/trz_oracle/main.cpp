// Reference-authored TRZ writer (interop oracle).
//
// Links the reference's REAL storage container stack — rt::Package
// (Package.cpp:47-122: microtar over gzip) + vendored microtar + nlohmann
// json — and reproduces TraceStorageTask's writeTraceFile entry sequence
// (TraceStorageTask.cpp:322-363: frame.json, then logic-<id>.apcm, then
// radio-<id>.apcm) with the exact writeFrameEntry (:458-525),
// writeLogicEntry (:643-760) and writeRadioEntry (:881-990) byte
// semantics, so the file this tool produces is what the reference
// application would have written.  nfclab's io/trz.py must read it back
// losslessly (tests/test_io.py interop test).
//
// Input: a JSON file
//   { "frames": [ {sampleStart,...,frameData?} ],
//     "logic":  [ {"id":N,"sampleRate":R,"offsets":[...],"values":[...]} ],
//     "radio":  [ {"id":N,"sampleRate":R,"offsets":[...],"values":[...]} ] }
// argv: <input.json> <output.trz>

#include <rt/Package.h>

#include <nlohmann/json.hpp>

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using json = nlohmann::json;

// SampleHdr layout (TraceStorageTask.cpp:56-61)
struct SampleHdr
{
   char magic[4];
   uint32_t version;
   uint32_t info[6];
};

#define INFO_FLAGS 0
#define INFO_START_OFFSET 1
#define INFO_TOTAL_SAMPLES 2
#define INFO_STREAM_ID 3
#define INFO_SAMPLE_RATE 4

static int writeFrames(rt::Package &package, const json &frames)
{
   // writeFrameEntry (TraceStorageTask.cpp:458-525): the frame entries are
   // pre-shaped by the caller; dump through the reference's own json lib
   const json info({{"frames", frames}});
   const std::string content = info.dump();
   if (package.addEntry("frame.json", content.length()) != 0)
      return 1;
   if (package.writeData(content.c_str(), content.length()) != 0)
      return 1;
   return 0;
}

static int writeLogic(rt::Package &package, const json &stream)
{
   // writeLogicEntry (TraceStorageTask.cpp:643-760), full time range
   const unsigned int id = stream["id"];
   const unsigned int sampleRate = stream["sampleRate"];
   const auto &offsets = stream["offsets"];
   const auto &values = stream["values"];
   const unsigned int sampleCount = offsets.size();

   SampleHdr hdr {.magic = {'A', 'P', 'C', 'M'}, .version = 2, .info = {}};
   // max(first buffer offset, sampleStart) — both 0 for a capture-start
   // stream over the full range (TraceStorageTask.cpp:672), which also
   // anchors the offset delta coding (lastOffset = sampleStart)
   hdr.info[INFO_START_OFFSET] = 0;
   hdr.info[INFO_STREAM_ID] = id;
   hdr.info[INFO_SAMPLE_RATE] = sampleRate;
   hdr.info[INFO_TOTAL_SAMPLES] = sampleCount;

   const std::string name = "logic-" + std::to_string(id) + ".apcm";
   if (package.addEntry(name, sizeof(hdr) + sampleCount * 2) != 0)
      return 1;
   if (package.writeData(&hdr, sizeof(hdr)) != 0)
      return 1;

   std::vector<unsigned char> chunk;
   unsigned int lastOffset = 0;  // sampleStart = 0 (full range)
   for (unsigned int i = 0; i < sampleCount; i++)
   {
      const auto offset = static_cast<unsigned int>(offsets[i].get<double>());
      const int sample = values[i].get<double>() > 0.5 ? 1 : 0;
      chunk.push_back(static_cast<unsigned char>(offset - lastOffset));
      chunk.push_back(static_cast<unsigned char>(sample));
      lastOffset = offset;
   }
   if (!chunk.empty() && package.writeData(chunk.data(), chunk.size()) != 0)
      return 1;
   return 0;
}

static int writeRadio(rt::Package &package, const json &stream)
{
   // writeRadioEntry (TraceStorageTask.cpp:881-990), full time range
   const unsigned int id = stream["id"];
   const unsigned int sampleRate = stream["sampleRate"];
   const auto &offsets = stream["offsets"];
   const auto &values = stream["values"];
   const unsigned int sampleCount = offsets.size();
   const float scale = (1 << 15);

   SampleHdr hdr {.magic = {'A', 'P', 'C', 'M'}, .version = 2, .info = {}};
   hdr.info[INFO_STREAM_ID] = id;
   hdr.info[INFO_START_OFFSET] = 0;
   hdr.info[INFO_SAMPLE_RATE] = sampleRate;
   hdr.info[INFO_TOTAL_SAMPLES] = sampleCount;

   const std::string name = "radio-" + std::to_string(id) + ".apcm";
   if (package.addEntry(name, sizeof(hdr) + sampleCount * 3) != 0)
      return 1;
   if (package.writeData(&hdr, sizeof(hdr)) != 0)
      return 1;

   std::vector<char> chunk;
   short lastSample = 0;
   unsigned int lastOffset = 0;  // sampleStart = 0 (full range)
   for (unsigned int i = 0; i < sampleCount; i++)
   {
      const auto sample =
         static_cast<short>(values[i].get<double>() * scale);
      const auto offset = static_cast<unsigned int>(offsets[i].get<double>());
      chunk.push_back(static_cast<char>((offset - lastOffset) & 0xff));
      chunk.push_back(static_cast<char>((sample - lastSample) & 0xff));
      chunk.push_back(static_cast<char>((sample - lastSample) >> 8));
      lastOffset = offset;
      lastSample = sample;
   }
   if (!chunk.empty() && package.writeData(chunk.data(), chunk.size()) != 0)
      return 1;
   return 0;
}

int main(int argc, char **argv)
{
   if (argc != 3)
   {
      fprintf(stderr, "usage: %s <input.json> <output.trz>\n", argv[0]);
      return 2;
   }

   std::ifstream in(argv[1]);
   if (!in)
   {
      fprintf(stderr, "cannot open %s\n", argv[1]);
      return 2;
   }
   json input = json::parse(in);

   rt::Package package(argv[2]);
   if (package.open(rt::Package::Write) != 0)
   {
      fprintf(stderr, "cannot create %s\n", argv[2]);
      return 2;
   }

   // writeTraceFile order (TraceStorageTask.cpp:336-348)
   if (writeFrames(package, input.value("frames", json::array())) != 0)
      return 1;
   for (const auto &s : input.value("logic", json::array()))
      if (writeLogic(package, s) != 0)
         return 1;
   for (const auto &s : input.value("radio", json::array()))
      if (writeRadio(package, s) != 0)
         return 1;

   package.close();
   return 0;
}
