// Minimal rt::Logger stub so rt::Package links without the full rt-lang
// logging stack (oracle harness only; logging is a no-op).
#include <rt/Logger.h>
#include <map>
#include <memory>
namespace rt {
Logger::Logger(std::string name_, int level_) : level(level_), name(std::move(name_)) {}
void Logger::trace(const std::string &, std::vector<Variant>) const {}
void Logger::debug(const std::string &, std::vector<Variant>) const {}
void Logger::info(const std::string &, std::vector<Variant>) const {}
void Logger::warn(const std::string &, std::vector<Variant>) const {}
void Logger::error(const std::string &, std::vector<Variant>) const {}
Logger *Logger::getLogger(const std::string &name, int level) {
    auto &m = loggers();
    auto it = m.find(name);
    if (it == m.end())
        it = m.emplace(name, std::shared_ptr<Logger>(new Logger(name, level))).first;
    return it->second.get();
}
std::map<std::string, std::shared_ptr<Logger>> &Logger::loggers() {
    static std::map<std::string, std::shared_ptr<Logger>> m;
    return m;
}
}
